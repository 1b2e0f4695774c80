"""Property/randomized tests (SURVEY.md §5): arbitrary payloads through the
distributed pipeline must (a) equal the single-threaded oracle per turn,
(b) keep the output total (no nulls, no dropped rows, no exceptions)."""

import hypothesis.strategies as st
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings

from ocr_ray.core.extract import extract_turn
from ocr_ray.pipelines.extract_pipeline import extract_dataset
from ocr_ray.stages.schemas import TRANSCRIPT_SCHEMA

# payload soup: html-ish fragments, form feeds, whitespace runs, unicode,
# data-uri prefixes, broken markup — the reference's guard cases
_FRAGMENTS = st.sampled_from(
    [
        "<div>", "</div>", "<p>", "</p>", "<a href='x'>", "</a>", "<nav>",
        "</nav>", "<h1>", "</h1>", "<script>var x=1;</script>", "<!-- c -->",
        "\f", "\n\n", "\n", "   ", "\t", "word", "Some sentence here.",
        "séance", "naïve", "日本語テキスト", "🚀", "&amp;", "&#233;",
        "data:text/plain;base64,", "data:", "-\n", "    indented line\n",
        "1 / 2\n", "<", ">", "<<>>", "</",
    ]
)
_PAYLOAD = st.lists(_FRAGMENTS, min_size=0, max_size=40).map("".join)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_PAYLOAD, min_size=1, max_size=12))
def test_kernel_totality(payloads):
    for p in payloads:
        r = extract_turn(p)
        assert isinstance(r.main_text, str)
        assert isinstance(r.error, str)
        assert all(b.text for b in r.blocks)  # blocks never hold empty text
        assert [b.block_idx for b in r.blocks] == list(range(len(r.blocks)))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_PAYLOAD, min_size=1, max_size=30))
def test_pipeline_equals_oracle_on_fuzz(payloads):
    n = len(payloads)
    t = pa.table(
        {
            "conv_id": [f"fz-{i:04d}" for i in range(n)],
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": ["user"] * n,
            "text": payloads,
            "tool": [""] * n,
            "ts": pa.array(range(n), pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    got = (
        extract_dataset(rd.from_arrow(t))
        .select_columns(["conv_id", "main_text", "error", "n_blocks"])
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert len(got) == n
    for i, p in enumerate(payloads):
        want = extract_turn(p)
        assert got["main_text"][i] == want.main_text, repr(p)
        assert got["error"][i] == want.error
        assert got["n_blocks"][i] == len(want.blocks)
