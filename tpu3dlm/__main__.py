"""`python -m tpu3dlm` — alias for the CLI entry (tpu3dlm.cli)."""

from tpu3dlm.cli import main

if __name__ == "__main__":
    main()
