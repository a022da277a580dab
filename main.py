"""Entry point parity: ``python -m main image|video|webcam|gallery``
(reference main.py:32-279). Delegates to animal_vision_tpu.cli."""

from animal_vision_tpu.cli import main

if __name__ == "__main__":
    main()
