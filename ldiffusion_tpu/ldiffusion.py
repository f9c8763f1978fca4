"""CLI entry: ``python -m ldiffusion_tpu.ldiffusion`` (mirrors the
reference's ``python -m LDiffusion.ldiffusion``, ``ldiffusion.py:326-331``)."""
from ldiffusion_tpu.api import LDiffusionModel, main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
