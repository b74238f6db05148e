"""Edit-distance kernel for dual-source text arbitration (C1/C2).

Reproduces ``levenshtein_distance`` (reference:
latyas/utils/text_utils.py:1-18, full DP, unit costs) as a vectorized
NumPy row-sweep: one dp row per character of the longer string, the
inner minimum computed with a prefix-scan instead of a per-cell Python
loop.  The independent oracle port (oracle/ref_port.py) keeps the
reference's nested-loop shape so the two can cross-check each other.
"""

from __future__ import annotations

import numpy as np


def levenshtein(s1: str, s2: str) -> int:
    """Unit-cost edit distance, identical to text_utils.py:1-18."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if len(s2) == 0:
        return len(s1)
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i in range(len(a)):
        cur[0] = i + 1
        sub = prev[:-1] + (b != a[i])
        ins = prev[1:] + 1
        np.minimum(sub, ins, out=cur[1:])
        # deletion term depends on cur itself (left neighbor): resolve
        # with a running minimum scan — cur[j] = min(cur[j], cur[j-1]+1)
        # propagated left to right = minimum.accumulate of cur - j, + j
        j = np.arange(len(b) + 1, dtype=np.int64)
        np.add(np.minimum.accumulate(cur - j), j, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def relative_distance(ocr_text: str, pdf_text: str) -> float:
    """``dis / max(len, len)`` (pdf2txt.py:82-83).

    Guard (documented deviation): both strings empty divides 0/0 in the
    reference and crashes; we define it as 0.0 — identical sources,
    prefer the native text.
    """
    m = max(len(ocr_text), len(pdf_text))
    if m == 0:
        return 0.0
    return levenshtein(ocr_text, pdf_text) / m
