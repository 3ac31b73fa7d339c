from . import se3, sim3, camera  # noqa: F401
from .camera import Intrinsics  # noqa: F401
