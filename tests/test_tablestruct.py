"""Table-structure assembly (M11 deterministic core) kernel tests.

The synth family in adapter.synth_table_objects is spanning-free by
construction (so it can be SQL-oracled); these tests pin the paths the
oracle can't reach: spanning-cell merge, the header AND rule, slotting
threshold/tie behavior, CSV header de-dup flattening and HTML
rowspan/colspan — against hand-computed expectations of the reference
semantics (tatr/pipeline.py:299-573).
"""

import pandas as pd

from latyas_spark.core.tablestruct import (
    assemble_cells,
    assemble_from_frame,
    cells_to_csv,
    cells_to_html,
    iob,
    sort_left_to_right,
    sort_top_to_bottom,
)

# a plain 2-row x 2-col table, row 0 headed
ROWS2 = [(0, 0, 200, 100), (0, 100, 200, 200)]
COLS2 = [(0, 0, 100, 200), (100, 0, 200, 200)]
HDR = [(0, 0, 200, 100)]


def tok(x, y, text, num):
    return ((x, y, x + 10, y + 10), text, num)


def test_simple_grid():
    cells = assemble_cells(
        ROWS2, COLS2, HDR,
        tokens=[tok(10, 10, "A", 0), tok(110, 10, "B", 1),
                tok(10, 110, "1", 2), tok(110, 110, "2", 3)],
    )
    assert len(cells) == 4
    by_rc = {(c["row_nums"][0], c["col_nums"][0]): c for c in cells}
    assert by_rc[(0, 0)]["text"] == "A" and by_rc[(0, 0)]["header"]
    assert by_rc[(1, 1)]["text"] == "2" and not by_rc[(1, 1)]["header"]
    assert cells_to_csv(cells) == "A,B\n1,2\n"
    assert (
        cells_to_html(cells)
        == "<table><thead><th>A</th><th>B</th></thead>"
        "<tr><td>1</td><td>2</td></tr></table>"
    )


def test_unsorted_input_order():
    # detection order scrambled; center-sort must recover the grid
    cells = assemble_cells(
        [ROWS2[1], ROWS2[0]], [COLS2[1], COLS2[0]], HDR,
        tokens=[tok(10, 10, "A", 0)],
    )
    by_rc = {(c["row_nums"][0], c["col_nums"][0]): c for c in cells}
    assert by_rc[(0, 0)]["text"] == "A"
    assert by_rc[(0, 0)]["header"] and not by_rc[(1, 0)]["header"]


def test_spanning_colspan_merge():
    # spanning cell covers both columns of row 0 (a merged header)
    span = [(0, 0, 200, 100)]
    cells = assemble_cells(
        ROWS2, COLS2, HDR, spanning=span,
        tokens=[tok(50, 10, "Title", 0), tok(10, 110, "1", 1),
                tok(110, 110, "2", 2)],
    )
    assert len(cells) == 3
    merged = [c for c in cells if len(c["col_nums"]) == 2][0]
    assert merged["row_nums"] == [0] and merged["col_nums"] == [0, 1]
    # header AND rule: both subcells were header rows -> header
    assert merged["header"]
    assert merged["text"] == "Title"
    # csv: spanning text fills every covered column (pipeline.py:530-534)
    assert cells_to_csv(cells) == "Title,Title\n1,2\n"
    assert (
        cells_to_html(cells)
        == '<table><thead><th colspan="2">Title</th></thead>'
        "<tr><td>1</td><td>2</td></tr></table>"
    )


def test_spanning_rowspan_and_header_and_rule():
    # spanning cell covers (0,0) and (1,0): one header subcell + one
    # non-header subcell -> merged cell is NOT header (AND rule,
    # pipeline.py:446-449)
    span = [(0, 0, 100, 200)]
    cells = assemble_cells(
        ROWS2, COLS2, HDR, spanning=span,
        tokens=[tok(10, 90, "left", 0), tok(110, 10, "B", 1),
                tok(110, 110, "2", 2)],
    )
    merged = [c for c in cells if len(c["row_nums"]) == 2][0]
    assert merged["col_nums"] == [0] and not merged["header"]
    html = cells_to_html(cells)
    assert 'rowspan="2"' in html
    # merged cell is not header but shares row 0: the row-opening cell
    # (min col first) is the merged one -> row renders as <tr>
    assert html.startswith('<table><tr><td rowspan="2">left</td>')


def test_slotting_threshold_and_max_overlap():
    # token straddling two cells goes to the one holding the larger
    # fraction; a token fully outside every cell is dropped
    cells = assemble_cells(
        ROWS2, COLS2, HDR,
        tokens=[
            ((90, 10, 104, 20), "mostly-left", 0),   # 10/14 in col 0
            ((300, 300, 310, 310), "outside", 1),    # overlap 0 -> dropped
        ],
    )
    by_rc = {(c["row_nums"][0], c["col_nums"][0]): c for c in cells}
    assert by_rc[(0, 0)]["text"] == "mostly-left"
    assert by_rc[(0, 1)]["text"] == ""
    assert all("outside" not in (c["text"] or "") for c in cells)


def test_multi_token_order_in_cell():
    cells = assemble_cells(
        ROWS2, COLS2, (),
        tokens=[tok(30, 10, "world", 7), tok(10, 10, "hello", 3)],
    )
    by_rc = {(c["row_nums"][0], c["col_nums"][0]): c for c in cells}
    assert by_rc[(0, 0)]["text"] == "hello world"


def test_csv_header_dedup_two_header_rows():
    # two header rows; column 0 repeats "X" -> de-dup join keeps one;
    # column 1 differs -> 'B | C' (OrderedDict.fromkeys semantics,
    # pipeline.py:537-539)
    rows3 = [(0, 0, 200, 100), (0, 100, 200, 200), (0, 200, 200, 300)]
    cols3 = [(0, 0, 100, 300), (100, 0, 200, 300)]
    hdr = [(0, 0, 200, 200)]  # covers rows 0 and 1
    cells = assemble_cells(
        rows3, cols3, hdr,
        tokens=[tok(10, 10, "X", 0), tok(110, 10, "B", 1),
                tok(10, 110, "X", 2), tok(110, 110, "C", 3),
                tok(10, 210, "1", 4), tok(110, 210, "2", 5)],
    )
    assert cells_to_csv(cells) == "X,B | C\n1,2\n"


def test_csv_no_header_and_empty():
    cells = assemble_cells(ROWS2, COLS2, (), tokens=[tok(10, 10, "a", 0)])
    # no header: first line is empty column names; empty cells render
    # as empty fields
    assert cells_to_csv(cells) == ",\na,\n,\n"
    assert cells_to_csv([]) is None
    assert assemble_cells([], COLS2) == []
    assert assemble_cells(ROWS2, []) == []


def test_csv_quoting():
    cells = assemble_cells(
        ROWS2, COLS2, (),
        tokens=[tok(10, 10, "a,b", 0), tok(110, 10, 'say "hi"', 1)],
    )
    out = cells_to_csv(cells)
    assert out.splitlines()[1] == '"a,b","say ""hi"""'


def test_iob_and_sorts():
    assert iob((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert iob((0, 0, 10, 10), (5, 0, 15, 10)) == 0.5
    assert iob((0, 0, 0, 10), (0, 0, 10, 10)) == 0.0  # zero-area box
    assert sort_top_to_bottom([(0, 100, 10, 200), (0, 0, 10, 100)]) == [1, 0]
    assert sort_left_to_right([(100, 0, 200, 10), (0, 0, 100, 10)]) == [1, 0]


def test_assemble_from_frame():
    pdf = pd.DataFrame(
        {
            "table_id": ["t"] * 6,
            "obj_type": ["row", "row", "column", "column", "header",
                         "token"],
            "x1": [0.0, 0.0, 0.0, 100.0, 0.0, 10.0],
            "y1": [0.0, 100.0, 0.0, 0.0, 0.0, 10.0],
            "x2": [200.0, 200.0, 100.0, 200.0, 200.0, 20.0],
            "y2": [100.0, 200.0, 200.0, 200.0, 100.0, 20.0],
            "text": [None, None, None, None, None, "A"],
            "token_num": [-1, -1, -1, -1, -1, 0],
        }
    )
    cells = assemble_from_frame(pdf)
    assert len(cells) == 4
    by_rc = {(c["row_nums"][0], c["col_nums"][0]): c for c in cells}
    assert by_rc[(0, 0)]["text"] == "A" and by_rc[(0, 0)]["header"]


def test_spark_matches_local_kernel(spark, sf001_dir, sf001_duck):
    """q_table_cells on Spark == the DuckDB oracle at sf0.001 (the
    driver runs the same comparison at sf0.01)."""
    from latyas_spark.relational.registry import (
        TABLE_CELLS_SQL,
        q_table_cells,
    )

    got = (
        q_table_cells(spark, sf001_dir)
        .toPandas()
        .sort_values(["table_id", "row_num", "col_num"])
        .reset_index(drop=True)
    )
    want = (
        sf001_duck.execute(TABLE_CELLS_SQL)
        .df()
        .sort_values(["table_id", "row_num", "col_num"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["cell_text"].tolist() == want["cell_text"].tolist()
    assert got["is_header"].tolist() == want["is_header"].tolist()


# -- property tests ---------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    n_rows=st.integers(1, 6),
    n_cols=st.integers(1, 5),
    header_rows=st.integers(0, 2),
    jitter=st.lists(st.integers(0, 4), min_size=24, max_size=24),
    n_tokens=st.integers(0, 12),
    seed=st.integers(0, 10**6),
)
def test_grid_invariants(n_rows, n_cols, header_rows, jitter, n_tokens, seed):
    """Without spanning cells the assembled grid is exactly R x C: every
    (row, col) appears once, header flags match the header boxes, and
    every in-cell token lands in its own cell."""
    import random

    rng = random.Random(seed)
    rows = [
        (0 - jitter[r % 24], r * 100 - jitter[(r + 1) % 24],
         n_cols * 80 + jitter[(r + 2) % 24],
         (r + 1) * 100 + jitter[(r + 3) % 24])
        for r in range(n_rows)
    ]
    cols = [
        (c * 80 - jitter[c % 24], 0 - jitter[(c + 5) % 24],
         (c + 1) * 80 + jitter[(c + 7) % 24],
         n_rows * 100 + jitter[(c + 11) % 24])
        for c in range(n_cols)
    ]
    hdr = (
        [(0, 0, n_cols * 80, header_rows * 100)] if header_rows else []
    )
    tokens = []
    expect = {}
    for t in range(n_tokens):
        r = rng.randrange(n_rows)
        c = rng.randrange(n_cols)
        x = c * 80 + 20 + rng.randrange(10)
        y = r * 100 + 30 + rng.randrange(10)
        tokens.append(((x, y, x + 20, y + 20), f"tok{t}", t))
        expect.setdefault((r, c), []).append(f"tok{t}")

    # scramble detection order
    rows_in = rows[:]
    cols_in = cols[:]
    rng.shuffle(rows_in)
    rng.shuffle(cols_in)

    cells = assemble_cells(rows_in, cols_in, hdr, tokens=tokens)
    assert len(cells) == n_rows * n_cols
    seen = {(c["row_nums"][0], c["col_nums"][0]) for c in cells}
    assert seen == {(r, c) for r in range(n_rows) for c in range(n_cols)}
    for cell in cells:
        r, c = cell["row_nums"][0], cell["col_nums"][0]
        assert cell["header"] == (r < header_rows)
        want = " ".join(expect.get((r, c), []))
        assert cell["text"] == want
