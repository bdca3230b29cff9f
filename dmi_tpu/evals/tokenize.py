"""Caption tokenizers.

ptb_tokenize mirrors what the COCO-caption Java PTBTokenizer produces for
caption-style text: word/contraction splitting, then lowercasing and
removal of the PUNCTUATIONS list (the same list the Java wrapper strips).
tokenizer_13a mirrors HF `evaluate`'s default BLEU tokenizer (mteval-13a).
"""

from __future__ import annotations

import re
from typing import List

# punctuation tokens removed by the COCO PTBTokenizer wrapper
PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

_CONTRACTIONS = re.compile(r"(?i)\b(\w+)(n't)\b")
_APOS = re.compile(r"(?i)(\w)('s|'re|'ve|'ll|'d|'m)\b")
_TOKEN = re.compile(r"(?i)n't|'(?:s|re|ve|ll|d|m)|\.\.\.|--|[\w$]+|[^\w\s]")


def ptb_tokenize(caption: str) -> List[str]:
    s = caption.replace("\n", " ")
    s = _CONTRACTIONS.sub(r"\1 \2", s)
    s = _APOS.sub(r"\1 \2", s)
    toks = _TOKEN.findall(s)
    return [t.lower() for t in toks if t not in PUNCTUATIONS]


def ptb_join(caption: str) -> str:
    return " ".join(ptb_tokenize(caption))


_13A_NONASCII = re.compile(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])")


def tokenizer_13a(line: str) -> List[str]:
    """mteval-v13a tokenization (HF evaluate bleu default)."""
    line = line.strip()
    line = re.sub(r"<skipped>", "", line)
    line = re.sub(r"-\n", "", line)
    line = re.sub(r"\n", " ", line)
    if "&" in line:
        line = line.replace("&quot;", '"').replace("&amp;", "&")
        line = line.replace("&lt;", "<").replace("&gt;", ">")
    line = f" {line} "
    line = re.sub(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])", r" \1 ", line)
    line = re.sub(r"([^0-9])([\.,])", r"\1 \2 ", line)
    line = re.sub(r"([\.,])([^0-9])", r" \1 \2", line)
    line = re.sub(r"([0-9])(-)", r"\1 \2 ", line)
    return line.split()
