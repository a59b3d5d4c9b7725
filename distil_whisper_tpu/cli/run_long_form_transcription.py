"""Long-form transcription eval — CLI mirror of the reference
``flax/run_long_form_transcription.py`` (chunked pipeline + hallucination
metrics).  Thin front-end over ``run_eval`` with long-form defaults: chunked
mode, 25 s chunks, WER/IER/SER/DER + repeated-5-gram reporting.

    python -m distil_whisper_tpu.cli.run_long_form_transcription \
        --model_checkpoint ./distil-large-v3 --dataset_path ./tedlium
"""

from __future__ import annotations

from .run_eval import main as _eval_main


def main(argv=None):
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--mode" not in argv and not (len(argv) == 1 and argv[0].endswith(".json")):
        argv += ["--mode", "chunked"]
    return _eval_main(argv)


if __name__ == "__main__":
    main()
