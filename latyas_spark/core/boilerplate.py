"""HTML boilerplate stripping via DOM-tree text-density heuristics.

This capability comes from the north rule ("HTML boilerplate strip ...
DOM heuristics") and the public text-density literature — Sun et al.,
"DOM Based Content Extraction via Text Density" (SIGIR 2011, CETD) and
Kohlschuetter et al., "Boilerplate Detection Using Shallow Text
Features" (WSDM 2010, Boilerpipe).  LATYAS contains no HTML code
(SURVEY.md preamble note), so nothing here is attributed to the
reference; the module reuses the same span in/out contract so the same
golden harness applies.

Two variants:

* ``flat_density_keep`` — node-local density with a per-document mean
  threshold.  Deliberately SQL-expressible (same arithmetic in Spark
  and DuckDB) so the driver's cross-engine hash gate covers it; see
  relational/registry.py::q_boilerplate_strip.
* ``strip_boilerplate_doc`` — the real CETD-style variant: composite
  text density over the (synthesized) DOM tree, subtree char/tag/link
  aggregation, threshold taken from the densest top-level branch
  ("body" heuristic).  Data-dependent tree recursion, not ANSI-SQL
  expressible; correctness is pinned by unit tests + the Spark-vs-
  local equality test (tests/test_boilerplate.py).

DOM synthesis: the corpus has no markup, so structure is derived
deterministically from (doc_id, text) alone — 64-char chunks are the
text nodes, an implicit binary tree (parent(i) = (i-1)//2) is the DOM,
and per-node depth/link flags come from md5(doc_id:nid) nibbles.  Both
engines and the local oracle derive byte-identical structure.
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Optional, Tuple

import numpy as np

CHUNK = 64
DEPTH_MOD = 6
LINK_MOD = 7
FLAT_KEEP_FACTOR = 0.8
FLAT_LINK_MIN_CHARS = 24


def node_hash(doc_id: str, nid: int) -> int:
    """First 4 hex chars of md5('doc_id:nid') as int — matches
    conv(substring(md5(concat(doc_id,':',nid)),1,4),16,10) in Spark and
    CAST(('0x'||substr(md5(...),1,4)) AS INT) in DuckDB."""
    return int(
        hashlib.md5(f"{doc_id}:{nid}".encode()).hexdigest()[:4], 16
    )


def synth_nodes(doc_id: str, text: Optional[str]) -> List[dict]:
    """Deterministic DOM-node synthesis: 64-char chunks + hash-derived
    depth / link flag.  Shared by the local oracle and tests; the Spark
    and DuckDB sides re-derive the identical rows with builtins."""
    if not text:
        return []
    out = []
    for nid in range(0, (len(text) + CHUNK - 1) // CHUNK):
        chunk = text[nid * CHUNK : (nid + 1) * CHUNK]
        h = node_hash(doc_id, nid)
        out.append(
            {
                "doc_id": doc_id,
                "nid": nid,
                "chunk": chunk,
                "depth": 1 + h % DEPTH_MOD,
                "is_link": h % LINK_MOD == 0,
            }
        )
    return out


def flat_density_keep(nodes: List[dict]) -> List[dict]:
    """Node-local density rule (SQL-expressible twin of the registry
    query): keep a node iff density >= 0.8 * doc mean density and it is
    not a short link node."""
    if not nodes:
        return []
    dens = [len(n["chunk"]) / (1.0 + n["depth"]) for n in nodes]
    mean = sum(dens) / len(dens)
    kept = []
    for n, d in zip(nodes, dens):
        if d < FLAT_KEEP_FACTOR * mean:
            continue
        if n["is_link"] and len(n["chunk"]) < FLAT_LINK_MIN_CHARS:
            continue
        kept.append(n)
    return kept


# ---------------------------------------------------------------- CETD

E = math.e


def _cetd_density(chars: float, tags: float, links: float) -> float:
    """Composite text density, CETD-style (Sun et al. 2011, eq. 4
    adapted to our feature set): (C/T) * ln(C/(L+1) + e).  The log
    factor suppresses link-heavy subtrees."""
    if tags <= 0:
        tags = 1.0
    if chars <= 0:
        return 0.0
    return (chars / tags) * math.log(chars / (links + 1.0) + E)


def strip_boilerplate_doc(
    doc_id: str, text: Optional[str]
) -> List[Tuple[int, str]]:
    """CETD over the implicit binary DOM tree of one document.

    Returns kept (nid, chunk) pairs in document order.  Steps:
      1. synthesize nodes; leaf features: chars=len(chunk),
         link_chars=chars if is_link else 0, tags=1.
      2. bottom-up subtree sums over parent(i) = (i-1)//2.
      3. threshold = composite density of the top-level branch (child
         of node 0) with the largest subtree char count — the "body"
         pick; falls back to the root's density for 1-2 node docs.
      4. keep node i iff its subtree composite density >= threshold
         OR an ancestor was kept (CETD keeps whole dense subtrees).
    """
    nodes = synth_nodes(doc_id, text)
    n = len(nodes)
    if n == 0:
        return []
    chars = np.array([float(len(nd["chunk"])) for nd in nodes])
    links = np.array(
        [float(len(nd["chunk"])) if nd["is_link"] else 0.0 for nd in nodes]
    )
    tags = np.ones(n)
    sub_c = chars.copy()
    sub_l = links.copy()
    sub_t = tags.copy()
    for i in range(n - 1, 0, -1):
        p = (i - 1) // 2
        sub_c[p] += sub_c[i]
        sub_l[p] += sub_l[i]
        sub_t[p] += sub_t[i]
    dens = np.array(
        [_cetd_density(sub_c[i], sub_t[i], sub_l[i]) for i in range(n)]
    )
    branches = [i for i in (1, 2) if i < n]
    if branches:
        body = max(branches, key=lambda i: (sub_c[i], -i))
        threshold = dens[body]
    else:
        threshold = dens[0]
    keep = np.zeros(n, dtype=bool)
    for i in range(n):
        if dens[i] >= threshold:
            keep[i] = True
        elif i > 0 and keep[(i - 1) // 2]:
            keep[i] = True
    return [(i, nodes[i]["chunk"]) for i in range(n) if keep[i]]


def strip_boilerplate_pdf(pdfs):
    """mapInPandas kernel: (doc_id, text) batches -> kept-node rows
    (doc_id, nid, chunk).  Vectorization note: per-doc tree math is
    numpy; the outer loop is per document, not per row."""
    import pandas as pd

    for pdf in pdfs:
        doc_ids, nids, chunks = [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            for nid, chunk in strip_boilerplate_doc(doc_id, text):
                doc_ids.append(doc_id)
                nids.append(nid)
                chunks.append(chunk)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype=object),
                "nid": pd.Series(nids, dtype="int32"),
                "chunk": pd.Series(chunks, dtype=object),
            }
        )
