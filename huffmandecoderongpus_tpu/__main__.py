"""`python -m huffmandecoderongpus_tpu` — the CLI driver."""

from huffmandecoderongpus_tpu.harness.cli import main

if __name__ == "__main__":
    main()
