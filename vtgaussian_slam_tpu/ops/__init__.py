from . import geometry
from .camera import Camera
