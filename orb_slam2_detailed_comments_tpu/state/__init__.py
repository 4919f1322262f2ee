from .frame import FrameData
from .map_store import MapStore
