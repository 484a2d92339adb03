"""CLI: `python -m ludwig_tpu [inputfile]` mirrors the reference binary,
which reads a file named `input` in the cwd (ref: src/main.c:30-46)."""

from ludwig_tpu.ludwig import main

main()
