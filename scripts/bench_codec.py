"""varbyte vs PForDelta on the index's actual stream shapes.

Measures encoded size and encode/decode throughput per codec over
(a) synthetic streams matching the block shapes (small doc-id gaps with
an absolute first value; tf streams; position deltas) and (b) REAL
streams re-encoded from a built index's posting blocks. Appends a
marked section to BENCH.md + BENCH_CODEC.json — the evidence behind
codec.py's wiring decision (PFor saves bytes; decode bandwidth is not
the query bottleneck after block-max pruning).

Usage: python scripts/bench_codec.py [index_path]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _bench_stream(name: str, blocks: list[np.ndarray], repeat: int = 5):
    from groonga_spark.codec import (
        pfor_decode,
        pfor_encode,
        vb_decode,
        vb_encode,
    )

    n_vals = sum(len(b) for b in blocks)

    def timed(fn):
        best = None
        for _ in range(repeat):
            t0 = time.time()
            out = [fn(b) for b in blocks]
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return out, best

    vb_bufs, vb_enc_s = timed(vb_encode)
    # decode timing over the encoded buffers
    best = None
    for _ in range(repeat):
        t0 = time.time()
        for buf in vb_bufs:
            vb_decode(buf)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    vb_dec_s = best

    pf_bufs, pf_enc_s = timed(pfor_encode)
    best = None
    for _ in range(repeat):
        t0 = time.time()
        for buf in pf_bufs:
            pfor_decode(buf)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    pf_dec_s = best

    # exactness safety check
    for b, buf in zip(blocks[:50], pf_bufs[:50]):
        assert (pfor_decode(buf) == b).all()

    vb_bytes = sum(len(b) for b in vb_bufs)
    pf_bytes = sum(len(b) for b in pf_bufs)
    mvps = lambda s: round(n_vals / s / 1e6, 1) if s else None  # noqa: E731
    return {
        "n_blocks": len(blocks),
        "n_values": n_vals,
        "vb_bytes": vb_bytes,
        "pfor_bytes": pf_bytes,
        "size_ratio": round(pf_bytes / vb_bytes, 3) if vb_bytes else None,
        "vb_enc_Mvals_s": mvps(vb_enc_s),
        "vb_dec_Mvals_s": mvps(vb_dec_s),
        "pfor_enc_Mvals_s": mvps(pf_enc_s),
        "pfor_dec_Mvals_s": mvps(pf_dec_s),
    }


def main() -> None:
    rng = np.random.default_rng(11)
    streams: dict[str, list[np.ndarray]] = {}

    # (a) synthetic block shapes
    def gap_block(df_frac: float) -> np.ndarray:
        mean_gap = max(1, int(1 / df_frac))
        gaps = rng.geometric(1 / mean_gap, 127).astype(np.uint64)
        first = np.uint64(rng.integers(1, 2_000_000_000))
        return np.concatenate([[first], gaps])

    streams["doc_gaps_head_term(df=5%)"] = [gap_block(0.05)
                                            for _ in range(2000)]
    streams["doc_gaps_tail_term(df=0.01%)"] = [gap_block(0.0001)
                                               for _ in range(2000)]
    streams["tf_stream"] = [
        rng.choice([1, 1, 1, 1, 2, 2, 3, 5], 128).astype(np.uint64)
        for _ in range(2000)
    ]
    streams["position_deltas"] = [
        rng.integers(1, 30, 256).astype(np.uint64) for _ in range(2000)
    ]

    # (b) real streams from a built index, if present
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gs_wand_idx_400"
    if os.path.isdir(os.path.join(idx_path, "postings")):
        import pyarrow.dataset as ds

        from groonga_spark.codec import vb_decode

        tbl = ds.dataset(
            os.path.join(idx_path, "postings"), format="parquet"
        ).head(4000, columns=["doc_deltas", "tfs"])
        streams["REAL_doc_deltas(2M-doc index)"] = [
            vb_decode(b.as_py()) for b in tbl.column("doc_deltas")
            if len(b.as_py())
        ]
        streams["REAL_tfs(2M-doc index)"] = [
            vb_decode(b.as_py()) for b in tbl.column("tfs")
            if len(b.as_py())
        ]

    results = {name: _bench_stream(name, blocks)
               for name, blocks in streams.items()}
    for name, r in results.items():
        print(f"{name}: size {r['size_ratio']}×  "
              f"dec vb {r['vb_dec_Mvals_s']} vs pfor "
              f"{r['pfor_dec_Mvals_s']} Mvals/s", file=sys.stderr)

    out = {"streams": results}
    with open(os.path.join(REPO, "BENCH_CODEC.json"), "w") as f:
        json.dump(out, f, indent=1)
    _append_bench_md(out)
    print(json.dumps(out))


def _append_bench_md(out: dict) -> None:
    lines = [
        "",
        "## Codec: varbyte vs PForDelta (block streams)",
        "",
        "PFor = binary packing + patched exceptions (Zukowski 2006 /",
        "Lemire-Boytsov 2012), implemented in codec.py, property-tested,",
        "NOT default-wired — after block-max pruning, decode bandwidth is",
        "not the query bottleneck; sizes below are the bytes it would buy.",
        "",
        "| stream | size pfor/vb | vb dec Mvals/s | pfor dec Mvals/s |"
        " vb enc | pfor enc |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in out["streams"].items():
        lines.append(
            f"| {name} | {r['size_ratio']} | {r['vb_dec_Mvals_s']} |"
            f" {r['pfor_dec_Mvals_s']} | {r['vb_enc_Mvals_s']} |"
            f" {r['pfor_enc_Mvals_s']} |"
        )
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from benchlib import splice_marked_section

    splice_marked_section("bench_codec", lines)


if __name__ == "__main__":
    main()
