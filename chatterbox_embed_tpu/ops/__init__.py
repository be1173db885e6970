from . import stft
from . import mel
from . import fbank
from . import resample
