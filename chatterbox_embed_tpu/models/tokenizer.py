"""English BPE text tokenizer (reference: models/tokenizers/tokenizer.py:16-50).
Wraps the HF `tokenizers` runtime (pure CPU, no torch)."""
from __future__ import annotations

import logging
from typing import List, Sequence

import numpy as np

logger = logging.getLogger(__name__)

SOT = "[START]"
EOT = "[STOP]"
UNK = "[UNK]"
SPACE = "[SPACE]"


class EnTokenizer:
    def __init__(self, vocab_file_path: str):
        from tokenizers import Tokenizer
        self.tokenizer = Tokenizer.from_file(vocab_file_path)
        voc = self.tokenizer.get_vocab()
        assert SOT in voc and EOT in voc, "tokenizer.json missing [START]/[STOP]"

    def text_to_tokens(self, text: str) -> np.ndarray:
        return np.asarray(self.encode(text), np.int32)[None, :]

    def encode(self, txt: str) -> List[int]:
        txt = txt.replace(" ", SPACE)
        return self.tokenizer.encode(txt).ids

    def decode(self, seq: Sequence[int]) -> str:
        txt = self.tokenizer.decode(list(np.asarray(seq).reshape(-1)),
                                    skip_special_tokens=False)
        return (txt.replace(" ", "").replace(SPACE, " ")
                .replace(EOT, "").replace(UNK, ""))
