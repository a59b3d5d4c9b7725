"""Checkpoint save/rotate/resume (Orbax) + best-by-WER tracking + HF export.

The TPU-idiomatic equivalent of the reference's two schemes: accelerator
``checkpoint-{step}-epoch-{e}`` dirs with regex discovery and rotation
(run_distillation.py:697-757, 1552-1604) and the flax path's
``train_state.msgpack`` (flax/run_distillation.py:720-761).  Orbax writes
sharded arrays directly from a GSPMD mesh and restores onto any topology.
Best checkpoints are rotated separately, named ``checkpoint-{step}-val-wer-
{wer:.3f}`` (reference :714-726, 1746-1775).
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, List, Optional, Tuple

CKPT_PATTERN = re.compile(r"^checkpoint-(\d+)$")
BEST_PATTERN = re.compile(r"^checkpoint-(\d+)-val-wer-([\d.]+)$")


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


class CheckpointManager:
    def __init__(self, output_dir: str, save_total_limit: Optional[int] = None,
                 best_total_limit: int = 1):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_total_limit = save_total_limit
        self.best_total_limit = best_total_limit
        self._ckptr = None

    @property
    def ckptr(self):
        if self._ckptr is None:
            self._ckptr = _checkpointer()
        return self._ckptr

    # ------------------------------------------------------------------
    @staticmethod
    def _clear(path: Path, tag: str) -> None:
        """Remove a stale checkpoint dir, multi-process-safe: only process 0
        touches the (possibly shared) filesystem, with a barrier so no
        process starts writing before the removal is complete."""
        import jax
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            if jax.process_index() == 0 and path.exists():
                shutil.rmtree(path)
            multihost_utils.sync_global_devices(f"ckpt_clear:{tag}")
        elif path.exists():
            shutil.rmtree(path)

    def save(self, step: int, state: Any, metadata: Optional[dict] = None
             ) -> str:
        import jax
        path = self.dir / f"checkpoint-{step}"
        self._clear(path, f"{step}")
        self.ckptr.save(path.absolute() / "state", state)
        self.ckptr.wait_until_finished()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"ckpt_saved:{step}")
        if jax.process_index() == 0:
            if metadata is not None:
                with open(path / "meta.json", "w") as f:
                    json.dump({"step": step, **metadata}, f)
            self._rotate()
        return str(path)

    def save_best(self, step: int, state: Any, val_wer: float) -> str:
        import jax
        path = self.dir / f"checkpoint-{step}-val-wer-{val_wer:.3f}"
        self._clear(path, f"best:{step}")
        self.ckptr.save(path.absolute() / "state", state)
        self.ckptr.wait_until_finished()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"ckpt_best_saved:{step}")
        if jax.process_index() == 0:
            self._rotate_best()
        return str(path)

    # ------------------------------------------------------------------
    def all_checkpoints(self) -> List[Tuple[int, Path]]:
        out = []
        for p in self.dir.iterdir():
            m = CKPT_PATTERN.match(p.name)
            if m and p.is_dir():
                out.append((int(m.group(1)), p))
        return sorted(out)

    def best_checkpoints(self) -> List[Tuple[float, int, Path]]:
        out = []
        for p in self.dir.iterdir():
            m = BEST_PATTERN.match(p.name)
            if m and p.is_dir():
                out.append((float(m.group(2)), int(m.group(1)), p))
        return sorted(out)  # ascending WER: best first

    def latest(self) -> Optional[Tuple[int, str]]:
        ckpts = self.all_checkpoints()
        if not ckpts:
            return None
        step, path = ckpts[-1]
        return step, str(path)

    # ------------------------------------------------------------------
    def restore(self, path: str, template_state: Any) -> Any:
        """Restore into the structure/shardings of ``template_state``."""
        return self.ckptr.restore(Path(path).absolute() / "state",
                                  target=template_state)

    def resume_latest(self, template_state: Any) -> Optional[Tuple[int, Any]]:
        latest = self.latest()
        if latest is None:
            return None
        step, path = latest
        return step, self.restore(path, template_state)

    # ------------------------------------------------------------------
    def _rotate(self):
        if self.save_total_limit is None:
            return
        ckpts = self.all_checkpoints()
        for _, path in ckpts[:max(0, len(ckpts) - self.save_total_limit)]:
            shutil.rmtree(path, ignore_errors=True)

    def _rotate_best(self):
        best = self.best_checkpoints()
        for _, _, path in best[self.best_total_limit:]:
            shutil.rmtree(path, ignore_errors=True)
