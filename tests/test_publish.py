"""Incremental artifact publishing (the reference's Hub-push channel,
run_pseudo_labelling.py:887-925, 1015-1018): local-mirror backend end-to-end
through the PL driver, Hub backend call sequencing against a fake API."""

import logging
from pathlib import Path

import pytest

from distil_whisper_tpu.utils.publish import (
    HubPublisher, LocalMirrorPublisher, make_publisher)


def test_local_mirror_incremental_and_finalize(tmp_path):
    out = tmp_path / "run"
    (out / "sub").mkdir(parents=True)
    (out / "a.csv").write_text("x,y\n1,2\n")
    (out / "sub" / "b.txt").write_text("hello")

    pub = LocalMirrorPublisher(str(tmp_path / "mirror"))
    pub.publish(out, [out / "a.csv"], "flush 1")
    assert (tmp_path / "mirror" / "a.csv").read_text() == "x,y\n1,2\n"
    assert not (tmp_path / "mirror" / "sub" / "b.txt").exists()

    # overwrite on re-publish; no .tmp leftovers (atomic rename)
    (out / "a.csv").write_text("x,y\n1,2\n3,4\n")
    pub.publish(out, [out / "a.csv"], "flush 2")
    assert (tmp_path / "mirror" / "a.csv").read_text() == "x,y\n1,2\n3,4\n"

    pub.finalize(out, "done")
    assert (tmp_path / "mirror" / "sub" / "b.txt").read_text() == "hello"
    assert not list((tmp_path / "mirror").rglob("*.tmp"))


class _FakeApi:
    def __init__(self):
        self.calls = []

    def create_repo(self, repo_id, repo_type=None, private=None,
                    exist_ok=None):
        self.calls.append(("create_repo", repo_id, repo_type, private,
                           exist_ok))

    def upload_file(self, path_or_fileobj=None, path_in_repo=None,
                    repo_id=None, repo_type=None, commit_message=None):
        self.calls.append(("upload_file", path_in_repo, repo_id, repo_type))

    def upload_folder(self, folder_path=None, repo_id=None, repo_type=None,
                      commit_message=None):
        self.calls.append(("upload_folder", folder_path, repo_id, repo_type))


def test_hub_publisher_call_sequence(tmp_path):
    out = tmp_path / "run"
    out.mkdir()
    (out / "transcriptions.csv").write_text("i,t\n")

    api = _FakeApi()
    pub = HubPublisher("org/pl-labels", api=api)
    assert api.calls[0] == ("create_repo", "org/pl-labels", "dataset", True,
                            True)
    pub.publish(out, [out / "transcriptions.csv"], "step 50")
    assert api.calls[1] == ("upload_file", "transcriptions.csv",
                            "org/pl-labels", "dataset")
    # missing file is skipped, not an error (CSV may not exist yet)
    pub.publish(out, [out / "nope.csv"], "step 100")
    pub.finalize(out, "done")
    assert api.calls[-1] == ("upload_folder", str(out), "org/pl-labels",
                             "dataset")


def test_safe_wrapper_contains_failures(tmp_path, caplog):
    class _Boom:
        def publish(self, *a, **k):
            raise OSError("network down")

        def finalize(self, *a, **k):
            raise OSError("network down")

    from distil_whisper_tpu.utils import publish as P
    pub = P._SafePublisher(_Boom())
    with caplog.at_level(logging.ERROR, logger="distil_whisper_tpu"):
        pub.publish(tmp_path, [], "m")   # must not raise
        pub.finalize(tmp_path, "m")
    assert pub.failures == 2
    assert any("publish failed" in r.message for r in caplog.records)


def test_make_publisher_off_by_default():
    assert make_publisher() is None


def test_pl_driver_publishes_mirror(tmp_path):
    """run_pseudo_labelling --publish_dir: the mirror ends up with the CSV
    (flushed incrementally) and the final load_from_disk-able dataset."""
    from tests.helpers import make_tiny_checkpoint, make_tone_dataset
    ckpt = make_tiny_checkpoint(tmp_path / "teacher")
    data = make_tone_dataset(tmp_path / "data", n=4)
    mirror = tmp_path / "mirror"

    from distil_whisper_tpu.cli.run_pseudo_labelling import main
    out = main([
        "--model_checkpoint", ckpt,
        "--dataset_path", data,
        "--output_dir", str(tmp_path / "pl"),
        "--per_device_batch_size", "2",
        "--language", "en",
        "--max_new_tokens", "8",
        "--logging_steps", "1",      # publish on every step
        "--publish_dir", str(mirror),
        "--dtype", "float32",
    ])
    assert (mirror / "transcriptions.csv").exists()
    rel = Path(out).relative_to(tmp_path / "pl")
    import datasets
    ds = datasets.load_from_disk(str(mirror / rel))
    assert "whisper_transcript" in ds.column_names
    assert len(ds) >= 1
