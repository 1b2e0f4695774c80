"""Deterministic synthetic transcript generation (FIXTURES.md §1).

The input table of the engine is ``(conv_id, turn_idx, role, text, tool, ts)``
(BASELINE.json input_hint). No transcript table ships in /root/testdata, so we
synthesize one as a pure function of ``(seed, conv index)`` — each
conversation is generated from its own ``random.Random((seed << 32) ^ i)``
stream, so the table content is independent of how generation is partitioned
across Ray tasks, and the single-threaded oracle sees byte-identical input.

Payload mix (FIXTURES.md): 40% plain, 30% html, 20% pdf-like, 10% edge
(empty / whitespace / giant single line / CJK+emoji / base64 data-URI —
the reference's guard + prefix-strip paths, extract-data-from-pdf.ts:116,
:134-145).
"""

from __future__ import annotations

import base64
import os
import random

import pyarrow as pa

from ocr_ray.stages.schemas import TRANSCRIPT_SCHEMA

_BASE_TS_US = 1_700_000_000_000_000  # fixed epoch anchor (no wall clock)

_WORDS = (
    "the quick brown fox jumps over lazy dog data pipeline extraction engine "
    "ray arrow parquet block stream shuffle partition séance prénom professeur "
    "classe cours salle présents naïve café crème déjà vu façade coöperate "
    "transcript conversation agent tool latency throughput cluster worker "
    "model batch schema column vector index token document content main"
).split()

# NFD accent pairs: same visible text, different normalization (tests NFC rule)
_NFD_WORDS = ["séance", "prénom", "naïve", "déjà"]

_CJK = "会話の抽出エンジンは決定論的です 数据处理流水线 대규모 병렬 처리"
_EMOJI = "🚀 ✨ 🧪 📄 🔍"

_TOOLS = ["", "", "", "", "search", "browser", "python", "calculator", "files"]
_ROLES = ["user", "assistant"]


def _sentence(rng: random.Random, lo: int = 5, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    if rng.random() < 0.15:
        ws[rng.randrange(n)] = rng.choice(_NFD_WORDS)
    s = " ".join(ws)
    return s[0].upper() + s[1:] + rng.choice([".", ".", ".", "?", "!"])


def _para(rng: random.Random, lo: int = 2, hi: int = 6) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


def _plain_payload(rng: random.Random) -> str:
    paras = [_para(rng) for _ in range(rng.randint(1, 4))]
    sep = rng.choice(["\n\n", "\n \n", "\n\t\n", "\n\n\n"])
    body = sep.join(paras)
    if rng.random() < 0.3:  # mixed whitespace runs
        body = body.replace(" ", "  ", 3).replace(". ", ".   ", 2)
    return body


def _link_farm(rng: random.Random, n: int) -> str:
    return " | ".join(
        f'<a href="/p/{rng.randrange(999)}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a>'
        for _ in range(n)
    )


def _html_payload(rng: random.Random) -> str:
    title = _sentence(rng, 3, 6)
    parts = [
        "<!DOCTYPE html><html><head><title>",
        title,
        "</title></head><body>",
        f"<nav><ul><li>{_link_farm(rng, rng.randint(3, 8))}</li></ul></nav>",
        f"<header><h1>{_sentence(rng, 3, 7)}</h1></header>",
        "<main><article>",
    ]
    for _ in range(rng.randint(2, 7)):
        if rng.random() < 0.25:
            parts.append(f"<h2>{_sentence(rng, 2, 5)}</h2>")
        parts.append(f"<p>{_para(rng)}</p>")
    if rng.random() < 0.4:
        parts.append(f"<p>See &amp; read {_sentence(rng)} &lt;more&gt; &#233;t&#233;.</p>")
    parts.append("</article></main>")
    parts.append(f'<aside>{_link_farm(rng, rng.randint(4, 10))}</aside>')
    parts.append(f"<footer><p>{_link_farm(rng, 2)} © corp</p></footer>")
    parts.append("</body></html>")
    html = "".join(parts)
    if rng.random() < 0.05:  # broken/unclosed markup
        html = html.replace("</p>", "", rng.randint(1, 3)).replace("</main>", "")
    return html


def _pdf_payload(rng: random.Random) -> str:
    n_pages = rng.randint(1, 3)
    doc_title = f"REPORT {rng.randrange(10_000):04d}"
    pages = []
    for pno in range(n_pages):
        lines = [doc_title, ""]
        for _ in range(rng.randint(2, 5)):
            para = _para(rng, 2, 4)
            # wrap at ~60 chars with occasional hyphenated breaks + indent
            words = para.split(" ")
            ln, out = "    ", []
            for w in words:
                if len(ln) + len(w) > 60:
                    if rng.random() < 0.15 and len(w) > 6:
                        cut = len(w) // 2
                        out.append(ln + " " + w[:cut] + "-")
                        ln = "    " + w[cut:]
                    else:
                        out.append(ln)
                        ln = "    " + w
                else:
                    ln = ln + " " + w if ln.strip() else ln + w
            out.append(ln)
            lines.extend(out)
            lines.append("")
        lines.append(f"{pno + 1} / {n_pages}")
        pages.append("\n".join(lines))
    return "\f".join(pages)


def _edge_payload(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.30:
        return ""
    if r < 0.50:
        return rng.choice([" ", "  \n\t ", "\n\n\n", "\t\t"])
    if r < 0.60:  # giant single line (skew bucket)
        return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(8_000, 40_000)))
    if r < 0.80:
        return f"{_CJK} {_EMOJI} {_sentence(rng)}"
    inner = f"<html><body><p>{_para(rng, 1, 2)}</p></body></html>"
    b64 = base64.b64encode(inner.encode("utf-8")).decode("ascii")
    return f"data:text/html;base64,{b64}"


def gen_conv(i: int, seed: int = 42):
    """Generate one conversation's rows. Pure function of (i, seed)."""
    rng = random.Random((seed << 32) ^ i)
    conv_id = f"conv-{i:08d}"
    n_turns = rng.randint(2, 12)
    rows = []
    for t in range(n_turns):
        role = _ROLES[t % 2] if rng.random() < 0.85 else rng.choice(["system", "tool"])
        r = rng.random()
        if r < 0.40:
            text = _plain_payload(rng)
        elif r < 0.70:
            text = _html_payload(rng)
        elif r < 0.90:
            text = _pdf_payload(rng)
        else:
            text = _edge_payload(rng)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": rng.choice(_TOOLS) if role == "tool" else "",
                "ts": _BASE_TS_US + i * 3_600_000_000 + t * 47_000_000,
            }
        )
    return rows


def conv_batch_table(indices, seed: int = 42) -> pa.Table:
    rows = [r for i in indices for r in gen_conv(int(i), seed)]
    return pa.table(
        {name: [r[name] for r in rows] for name in TRANSCRIPT_SCHEMA.names},
        schema=TRANSCRIPT_SCHEMA,
    )


def generate_transcripts_table(n_convs: int, seed: int = 42) -> pa.Table:
    """Driver-side generation (tests / tiny scales only)."""
    return conv_batch_table(range(n_convs), seed)


def n_convs_for_sf(sf_dir: str) -> int:
    """Map a testdata sf dir to a deterministic transcript scale."""
    name = os.path.basename(os.path.normpath(sf_dir))
    table = {"sf0.001": 200, "sf0.01": 2_000, "sf0.1": 60_000}
    if name in table:
        return table[name]
    try:
        return max(20, int(float(name.replace("sf", "")) * 200_000))
    except ValueError:
        return 200


def _default_fixture_root() -> str:
    """tmpfs by default: the sandbox's virtual disk is burst-throttled, and
    every transcript-reading query pays the read (strip_common_lines makes
    THREE full passes — measured 20.4 s from /tmp vs the compute cost of
    ~7 s). A real deployment reads from S3/NVMe that scales with nodes."""
    root = os.environ.get("OCR_RAY_FIXTURE_ROOT")
    if root:
        return root
    return (
        "/dev/shm/ocr_ray_fixtures"
        if os.access("/dev/shm", os.W_OK)
        else "/tmp/ocr_ray_fixtures"
    )


def transcripts_path(n_convs: int, seed: int = 42, root: str | None = None) -> str:
    return os.path.join(root or _default_fixture_root(), f"transcripts_s{seed}_c{n_convs}")


def ensure_transcripts(n_convs: int, seed: int = 42, root: str | None = None) -> str:
    """Generate (once, cached) the transcript parquet dir via a Ray pipeline.

    Generation itself is distributed: ``ray.data.range(n_convs)`` →
    ``map_batches(conv_batch_table)`` → ``write_parquet``. Determinism holds
    because each conversation is a pure function of (seed, index).
    """
    root = root or _default_fixture_root()
    out = transcripts_path(n_convs, seed, root)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import shutil

    if n_convs <= 5_000:
        # small fixtures: generate driver-side without touching Ray (this
        # path must be callable from contexts where starting a Ray session
        # would be a side effect, e.g. oracle-SQL string construction)
        import pyarrow.parquet as pq

        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            generate_transcripts_table(n_convs, seed),
            os.path.join(tmp, "part-0.parquet"),
        )
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)
        with open(marker, "w") as f:
            f.write("ok")
        return out

    import ray.data as rd

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    # ~300 convs/file ≈ 2 MB/file: big enough that read/map task overhead
    # amortizes, small enough for parallelism (task count ≈ a few x CPUs)
    n_blocks = max(4, min(n_convs // 300, 2048))
    (
        rd.range(n_convs, override_num_blocks=n_blocks)
        .map_batches(
            lambda b: conv_batch_table(b["id"], seed),
            batch_format="numpy",
            batch_size=400,
        )
        .write_parquet(tmp)
    )
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out

def gen_echo_conv(i: int, seed: int = 23):
    """Conversation generator with PLANTED reply-echo turns (r5): with
    probability ~0.35 a turn opens by quoting the ENTIRE previous turn and
    appends a fresh plain paragraph — the context-aware engine's strip
    domain. The appended remainder is always a plain payload so the
    stripped corpus stays inside the provable engine subsets (the
    context-gate's union mirror needs full coverage)."""
    rng = random.Random((seed << 34) ^ (i * 0x9E3779B1))
    conv_id = f"ctx-{i:08d}"
    n_turns = rng.randint(2, 10)
    rows = []
    prev_text = ""
    for t in range(n_turns):
        role = _ROLES[t % 2]
        r = rng.random()
        if t > 0 and prev_text and r < 0.35:
            text = prev_text + rng.choice(["\n\n", "\n \n"]) + _para(rng, 1, 3)
        elif r < 0.65:
            text = _plain_payload(rng)
        elif r < 0.85:
            text = _html_payload(rng)
        else:
            text = _pdf_payload(rng)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": "",
                "ts": _BASE_TS_US + i * 3_600_000_000 + t * 47_000_000,
            }
        )
        prev_text = text
    return rows


def ensure_echo_transcripts(n_convs: int, seed: int = 23, root: str | None = None) -> str:
    """Cached parquet dir for the planted-echo corpus (driver-side
    generation only — the fixture scales are small)."""
    root = root or _default_fixture_root()
    out = os.path.join(root, f"echoconv_s{seed}_c{n_convs}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import shutil

    import pyarrow.parquet as pq

    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    rows = [r for i in range(n_convs) for r in gen_echo_conv(i, seed)]
    t = pa.table(
        {name: [r[name] for r in rows] for name in TRANSCRIPT_SCHEMA.names},
        schema=TRANSCRIPT_SCHEMA,
    )
    pq.write_table(t, os.path.join(tmp, "part-0.parquet"))
    try:
        os.replace(tmp, out)
    except OSError:
        if os.path.exists(marker):
            shutil.rmtree(tmp, ignore_errors=True)
            return out
        shutil.rmtree(out, ignore_errors=True)
        os.replace(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out

