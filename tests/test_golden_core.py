"""Golden span-sequence equality: NumPy kernels vs the independent
pure-Python oracle port, document by document, on the deterministic
fixture corpus.  Pass criterion per FIXTURES.md §3: the full ordered
sequence (kind, text, media_ref, order) is equal."""

import numpy as np
import pytest

from latyas_spark.core.document import (
    DEFAULT_CONFIG,
    ExtractConfig,
    extract_document_rows,
)
from latyas_spark.fixtures import doc_rows
from latyas_spark.oracle.ref_port import extract_document_oracle

N_DOCS = 150


@pytest.mark.parametrize("batch", range(5))
def test_kernel_matches_oracle(batch):
    for i in range(batch * (N_DOCS // 5), (batch + 1) * (N_DOCS // 5)):
        doc_id = f"doc-{i:08d}"
        rows = doc_rows(doc_id)
        got = extract_document_rows(rows)
        want = extract_document_oracle(rows)
        assert got == want, f"span mismatch in {doc_id}"


def test_mega_doc_matches():
    rows = doc_rows("doc-mega-0", mega=True)
    assert len({r["page"] for r in rows}) >= 24
    assert extract_document_rows(rows) == extract_document_oracle(rows)


def test_cjk_filter_mode_matches():
    cfg = ExtractConfig(cjk_filters=True)
    for i in range(40):
        rows = doc_rows(f"doc-{i:08d}")
        assert extract_document_rows(rows, cfg) == extract_document_oracle(rows, cfg)


def test_cjk_filters_drop_crossrefs():
    cfg = ExtractConfig(cjk_filters=True)
    dropped_somewhere = False
    for i in range(80):
        rows = doc_rows(f"doc-{i:08d}")
        plain = extract_document_rows(rows)
        filtered = extract_document_rows(rows, cfg)
        assert len(filtered) <= len(plain)
        if len(filtered) < len(plain):
            dropped_somewhere = True
    assert dropped_somewhere


def test_output_is_deterministic():
    rows1 = doc_rows("doc-00000042")
    rows2 = doc_rows("doc-00000042")
    assert rows1 == rows2
    assert extract_document_rows(rows1) == extract_document_rows(rows2)


def test_order_column_is_dense():
    rows = doc_rows("doc-00000007")
    out = extract_document_rows(rows)
    assert [o for _, _, _, o in out] == list(range(len(out)))


def test_media_spans_interleaved():
    found = False
    for i in range(60):
        out = extract_document_rows(doc_rows(f"doc-{i:08d}"))
        for kind, text, media, _ in out:
            if media is not None:
                assert text is None
                assert kind in {"figure", "icon", "qrcode", "barcode"}
                found = True
    assert found
