from .vocabulary import BinaryVocabulary
from .kf_database import KeyFrameDatabase
