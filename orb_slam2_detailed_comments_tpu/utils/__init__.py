from .config import SlamConfig, OrbConfig, load_settings_yaml
from .timing import StageTimer
