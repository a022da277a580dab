"""Frame I/O: image / video / webcam renderers (OpenCV at the boundary only)."""

from animal_vision_tpu.io.renderer import Renderer  # noqa: F401
from animal_vision_tpu.io.image import ImageRenderer  # noqa: F401
from animal_vision_tpu.io.video import VideoRenderer  # noqa: F401
from animal_vision_tpu.io.webcam import WebcamRenderer  # noqa: F401
