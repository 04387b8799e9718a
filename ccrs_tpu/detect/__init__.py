"""AprilGrid detection: device threshold -> native quads -> device decode."""

from .detector import TagDetector
from .families import FAMILY_NAMES, TagFamily, get_family

__all__ = ["TagDetector", "TagFamily", "get_family", "FAMILY_NAMES"]
