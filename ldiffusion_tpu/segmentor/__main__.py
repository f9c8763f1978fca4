"""``python -m ldiffusion_tpu.segmentor`` — the nnUNet-style CLI
(see ``segmentor/cli.py``)."""
from ldiffusion_tpu.segmentor.cli import main

if __name__ == "__main__":
    main()
