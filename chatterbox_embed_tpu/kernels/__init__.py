from .flash_decode import decode_attention
