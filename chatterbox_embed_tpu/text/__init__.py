from .normalization import punc_norm
from .sanitizer import AdvancedTextSanitizer
