"""Native (C++) runtime components, loaded via ctypes."""

from animal_vision_tpu.native.ring import FrameRing, native_available  # noqa: F401
