"""Interleave kernel tests (reference Bbox.py / mix_inference.py /
to_katex.py semantics — cites in latyas_spark/core/mixkernel.py)."""

import pytest

from latyas_spark.core.mixkernel import (
    MixBox,
    assemble_markdown,
    change_all,
    merge_same_row,
    normalize_inline,
    split_conflict,
    to_katex,
    wrap_latex_content,
)


def B(x, y, h, w, label=None, content=None):
    return MixBox(x, y, h, w, label=label, content=content)


class TestSameRow:
    def test_containment_is_same_row(self):
        a, b = B(0, 10, 10, 50), B(60, 0, 40, 50)
        assert a.same_row(b) and b.same_row(a)

    def test_disjoint_is_different_row(self):
        a, b = B(0, 0, 10, 50), B(0, 20, 10, 50)
        assert not a.same_row(b)

    def test_partial_overlap_threshold(self):
        # overlap with relative top offset 3/10 < 0.4 -> same row
        assert B(0, 0, 10, 50).same_row(B(0, 3, 10, 50))
        # offset 5/10 >= 0.4 -> different rows
        assert not B(0, 0, 10, 50).same_row(B(0, 5, 10, 50))

    def test_row_major_order(self):
        boxes = [B(50, 0, 10, 20), B(0, 0, 10, 20), B(0, 30, 10, 20)]
        s = sorted(boxes)
        assert [(b.x, b.y) for b in s] == [(0, 0), (50, 0), (0, 30)]


class TestMergeSameRow:
    def test_adjacent_same_row_merged(self):
        boxes = sorted([B(0, 0, 10, 30), B(25, 0, 10, 30)])
        out = merge_same_row(boxes)
        assert len(out) == 1
        assert out[0].x == 0 and out[0].w == 55

    def test_gap_not_merged(self):
        boxes = sorted([B(0, 0, 10, 20), B(40, 0, 10, 20)])
        out = merge_same_row(boxes)
        assert len(out) == 2

    def test_different_rows_not_merged(self):
        boxes = sorted([B(0, 0, 10, 20), B(0, 30, 10, 20)])
        assert len(merge_same_row(boxes)) == 2

    def test_empty(self):
        assert merge_same_row([]) == []


class TestSplitConflict:
    def test_no_latex_passthrough(self):
        ocr = [B(0, 0, 10, 50, "text")]
        assert split_conflict(ocr, []) is ocr

    def test_single_ocr_short_circuits(self):
        # quirk: one text box is returned untouched even with latex
        ocr = [B(0, 0, 10, 100, "text")]
        latex = [B(20, 0, 10, 30, "embedding")]
        assert split_conflict(ocr, latex) is ocr

    def test_text_split_around_nested_latex(self):
        ocr = [B(0, 0, 10, 100, "text"), B(0, 30, 10, 100, "text")]
        latex = [B(40, 0, 10, 20, "embedding")]
        out = split_conflict(ocr, latex)
        texts = [(b.x, b.right, b.label) for b in out if b.same_row(ocr[0])]
        # first row: text [0,40), latex [40,60), text [60,100)
        row0 = [t for t in [(b.x, b.right, b.label) for b in out] if t[0] < 100]
        labels = [b.label for b in sorted(out)]
        xs = [(b.x, b.right) for b in sorted(out)]
        assert labels == ["text", "embedding", "text", "text"]
        assert xs[0] == (0, 40) and xs[1] == (40, 60) and xs[2] == (60, 100)

    def test_text_truncated_at_latex_left_edge(self):
        # latex overlaps the right part of the text and extends past it
        ocr = [B(0, 0, 10, 60, "text"), B(0, 30, 10, 60, "text")]
        latex = [B(40, 0, 10, 40, "isolated")]
        out = sorted(split_conflict(ocr, latex))
        assert [(b.x, b.right, b.label) for b in out][:2] == [
            (0, 40, "text"),
            (40, 80, "isolated"),
        ]


class TestAssemble:
    def test_plain_rows_joined_with_spaces(self):
        boxes = [
            B(0, 0, 10, 50, "text", "hello"),
            B(0, 30, 10, 50, "text", "world"),
        ]
        assert assemble_markdown(boxes) == "hello world"

    def test_same_row_no_space(self):
        boxes = [
            B(0, 0, 10, 50, "text", "ab"),
            B(60, 0, 10, 50, "text", "cd"),
        ]
        assert assemble_markdown(boxes) == "abcd"

    def test_isolated_tag_splice(self):
        eq = B(100, 0, 20, 200, "isolated", wrap_latex_content("E=mc^2", "isolated"))
        tag = B(320, 5, 10, 30, "text", "(3)")
        out = assemble_markdown([eq, tag])
        assert out == "$$E=mc^2\\tag{3}$$"

    def test_embedding_normalized(self):
        eq = B(
            60, 0, 10, 40, "embedding",
            wrap_latex_content(r"\textbf{x} + y", "embedding"),
        )
        txt = B(0, 0, 10, 50, "text", "where")
        out = assemble_markdown([txt, eq])
        assert out == "where $x + y$"

    def test_empty(self):
        assert assemble_markdown([]) == ""


class TestLatexRewrite:
    def test_change_all_strips_bold(self):
        assert change_all(r"a \textbf{bc} d", r"\textbf", " ", "{", "}", "", " ") == "a  bc  d"

    def test_change_all_nested_braces(self):
        s = r"\textbf{a {nested} b}"
        assert change_all(s, r"\textbf", " ", "{", "}", "", " ") == " a {nested} b "

    def test_change_all_escaped_brace_ignored(self):
        s = r"\textbf{a \} b}"
        assert change_all(s, r"\textbf", " ", "{", "}", "", " ") == r" a \} b "

    def test_to_katex_split_env_and_spaces(self):
        assert to_katex(r"a  \,\, b") == "a b"
        assert to_katex(r"\mbox{hi} x") == "hi x"

    def test_to_katex_merges_adjacent_text(self):
        assert to_katex(r"\text{ab}\text{cd}") == r"\text{abcd}"

    def test_normalize_inline_contract(self):
        out = normalize_inline(r" $\bm{v} = 0$ ")
        assert out == " $v = 0$ "

    def test_normalize_inline_malformed_passes_through(self):
        """VERDICT r2 #6: malformed input (missing the ' $...$ ' frame)
        must NOT raise inside the kernel — it is cleaned, returned
        un-retightened, and counted in KERNEL_FALLBACKS."""
        from latyas_spark.core.mixkernel import KERNEL_FALLBACKS

        before = KERNEL_FALLBACKS["normalize_inline_malformed"]
        assert normalize_inline("$x$") == "$x$"
        assert normalize_inline(r"\bm{v} raw") == " v raw"
        assert KERNEL_FALLBACKS["normalize_inline_malformed"] == before + 2

    def test_split_conflict_invariant_raises_typed_error(self):
        """Sweep invariant violations raise MixSweepInvariantError (not
        AssertionError), and compose_mixed_page's guard keeps genuinely
        malformed geometry from killing the kernel."""
        from latyas_spark.core.mixkernel import (
            MixBox,
            MixSweepInvariantError,
            split_conflict,
        )

        # two latex boxes overlapping in one row bypassing the dedup
        # guard (split_conflict called directly)
        t = [
            MixBox(0, 0, 20, 50, label="text", content="a"),
            MixBox(300, 0, 20, 50, label="text", content="b"),
        ]
        lx = [
            MixBox(60, 0, 20, 100, label="embedding", content="x"),
            MixBox(100, 0, 20, 100, label="embedding", content="y"),
        ]
        with pytest.raises(MixSweepInvariantError):
            split_conflict(t, lx)


def test_compose_mixed_page_interleaves_inline_and_tags():
    from latyas_spark.core.mixkernel import compose_mixed_page

    md = compose_mixed_page(
        [(0, 0, 100, 20, "hello world"), (150, 0, 260, 20, "(3)")],
        [(110, 0, 140, 20, True, "x^2 + y_1")],
    )
    assert md == "hello world\n\n$$x^2 + y_1\\tag{3}$$"
    # single text box: split short-circuits but the latex must still
    # appear (mix_inference.py:218 assembles ocr + latex regardless)
    md2 = compose_mixed_page(
        [(0, 0, 300, 20, "inline sample text")],
        [(120, 2, 180, 18, False, "\\alpha")],
    )
    assert "$\\alpha$" in md2
    md3 = compose_mixed_page(
        [(0, 0, 120, 20, "left part"), (200, 0, 330, 20, "right part")],
        [(130, 2, 190, 18, False, "\\beta + 1")],
    )
    assert md3 == "left part $\\beta + 1$ right part"


def test_mix_interleave_spark_matches_local(spark, sf001_dir):
    from latyas_spark.core.blocktypes import (
        EMBED_EQ, EQUATION, TEXT_KINDS, kind_from_label,
    )
    from latyas_spark.core.mixkernel import compose_mixed_page
    from latyas_spark.pipeline.adapter import synth_blocks
    from latyas_spark.relational.registry import q_mix_interleave

    got = {
        (r["doc_id"], r["page"]): r["markdown"]
        for r in q_mix_interleave(spark, sf001_dir).collect()
    }
    rows = synth_blocks(spark, sf001_dir).collect()
    pages = {}
    for r in rows:
        pages.setdefault((r["doc_id"], r["page"]), []).append(r)
    want = {}
    for key, rs in pages.items():
        texts, eqs = [], []
        for r in rs:
            if r["conf"] <= 0.3:
                continue
            yb = float(int(r["y1"] // 80) * 80)  # line-band snap
            k = kind_from_label(r["label"])
            if k == EQUATION:
                eqs.append((r["x1"], yb, r["x2"], yb + 64, True, r["text"]))
            elif k == EMBED_EQ:
                eqs.append((r["x1"], yb, r["x2"], yb + 64, False, r["text"]))
            elif k in TEXT_KINDS:
                texts.append((r["x1"], yb, r["x2"], yb + 64, r["text"]))
        md = compose_mixed_page(texts, eqs)
        if md:
            want[key] = md
    assert got == want
    assert len(got) > 30  # the corpus genuinely exercises the path


def test_compose_truncate_family_band_semantics():
    """Independent pin of the mix_trunc family's closed form (the
    registry oracle re-derives it in SQL; this recomputes it from the
    kernel directly): on the T1=[0,100) T2=[120,380) L=[250,450)
    geometry, every band except the LAST loses T2's content to the
    truncate branch, and the last band keeps it via the sweep's
    unconditional final append (mix_inference.py:117-118)."""
    from latyas_spark.core.mixkernel import compose_mixed_page

    bands = 3
    texts, eqs = [], []
    for b in range(bands):
        y = float(b * 80)
        texts.append((0.0, y, 100.0, y + 64, f"t1 {b}"))
        texts.append((120.0, y, 380.0, y + 64, f"cont {b}"))
        eqs.append((250.0, y, 450.0, y + 64, b % 2 == 0, f"frm {b}"))
    md = compose_mixed_page(texts, eqs)
    # bands 0..B-2: T1 + wrapped formula only; band B-1: T1+T2+formula
    assert "cont 0" not in md
    assert "cont 1" not in md
    assert "cont 2" in md
    expected = (
        "t1 0\n\n$$frm 0$$\n\n t1 1 $frm 1$  t1 2cont 2\n\n$$frm 2$$"
    )
    assert md == expected
