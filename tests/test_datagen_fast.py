"""Datagen/oracle vectorization is bit-frozen against the naive originals.

The bench harness uses Arrow-fused string assembly in ``generate_events``
and the vectorized ``replay_oracle_fast`` (drop_duplicates under LWW).
Correctness anchoring:

- ``generate_events`` output is pinned to sha256 hashes captured from the
  original np.char / object-concat implementation — the optimization must
  be byte-identical, not merely similar.
- ``replay_oracle_fast`` must frame-equal the deliberately-naive dict
  replay (``replay_oracle``) on seeded streams AND on a handcrafted
  adversarial stream (delete→reinsert resurrection, absent-key delete,
  update-after-delete) — the cases where "last event wins" could diverge
  from true sequential replay if it were wrong.
- ``write_change_feed`` round-trips: reading every segment back and
  sorting by lsn reproduces the generated stream.
"""

from __future__ import annotations

import glob
import hashlib
import os
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transcript_cdc.datagen import (
    StreamSpec,
    generate_events,
    replay_oracle,
    replay_oracle_fast,
    write_change_feed,
)

SPEC_A = dict(n_conversations=300, seed=42)
SPEC_B = dict(
    n_conversations=777,
    seed=7,
    update_ratio=0.5,
    delete_ratio=0.15,
    out_of_order_fraction=0.3,
    evolution_at=0.4,
)

# sha256 of df.to_csv(index=False, na_rep="\\N"), captured from the
# pre-vectorization implementation (np.char string assembly, dict replay).
PINNED = {
    "A": (
        "eb74f9480047463f34a1ffc2a4e84ba572fb905eeefcff5bd67388e6ca93a29f",
        "4c9d6f465d7e7bfb7fcbc08459dfc9dcf2b72dd7df9fec0fe0378ed79b288665",
        "c9a94c9c6092551588f03a0eaf648d7467310de6877f2b4ca6a116448dd5491c",
    ),
    "B": (
        "d6641dcaef9145dc2ca021ba8897fe81715a2632dbb3e33cb0ff5b46deec3302",
        "ff1c3509b3b2958e237a00dcaa98e1b7eb37a9e968f27d0f51bb6d4034b9782c",
        "ca225160b0cd34c194e93e24af3a13f0637a14ef10ff9605b796419e9cdda4cf",
    ),
}


def _h(df: pd.DataFrame) -> str:
    return hashlib.sha256(df.to_csv(index=False, na_rep="\\N").encode()).hexdigest()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind in "if" or str(out[c].dtype).startswith("Int"):
            out[c] = out[c].astype("float64")
        elif out[c].dtype == object:
            # unify null-likes (<NA> from the dict replay vs nan from the
            # drop_duplicates path): a future pandas makes
            # assert_frame_equal treat them as non-matching. Numeric-valued
            # object columns (dict replay leaves `tokens` as object ints)
            # go to float64 like the nullable-int branch above.
            try:
                out[c] = pd.to_numeric(out[c]).astype("float64")
            except (ValueError, TypeError):
                out[c] = out[c].where(out[c].notna(), None)
    return out


@pytest.mark.parametrize("name,kwargs", [("A", SPEC_A), ("B", SPEC_B)])
def test_generated_stream_and_oracles_pinned(name, kwargs):
    df = generate_events(StreamSpec(**kwargs))
    exp_df, exp_norm, exp_raw = PINNED[name]
    assert _h(df) == exp_df, "generate_events output drifted from pinned bytes"
    assert _h(replay_oracle(df, normalize=True)) == exp_norm
    assert _h(replay_oracle(df, normalize=False)) == exp_raw


@pytest.mark.parametrize("kwargs", [SPEC_A, SPEC_B])
@pytest.mark.parametrize("normalize", [True, False])
def test_fast_oracle_matches_dict_replay(kwargs, normalize):
    df = generate_events(StreamSpec(**kwargs))
    naive = replay_oracle(df, normalize=normalize)
    fast = replay_oracle_fast(df, normalize=normalize)
    pd.testing.assert_frame_equal(
        _canon(naive), _canon(fast), check_dtype=False
    )


def test_fast_oracle_adversarial_sequences():
    rows = [
        # resurrection: I, D, then later I must reappear with the new text
        (0, "I", "c1", 0, "user", "first", None),
        (3, "D", "c1", 0, "user", None, None),
        (7, "I", "c1", 0, "user", "reborn", None),
        # delete wins when it is last
        (1, "I", "c2", 0, "user", "gone soon", None),
        (8, "D", "c2", 0, "user", None, None),
        # absent-key delete is a no-op
        (2, "D", "c3", 5, "user", None, None),
        # update after delete re-creates the row (upsert semantics)
        (4, "I", "c4", 1, "assistant", "v1", "search"),
        (5, "D", "c4", 1, "assistant", None, None),
        (6, "U", "c4", 1, "assistant", "v2", "python"),
    ]
    df = pd.DataFrame(
        rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool"]
    )
    df["ts"] = pd.Timestamp("2025-01-01")
    naive = replay_oracle(df, normalize=False)
    fast = replay_oracle_fast(df, normalize=False)
    pd.testing.assert_frame_equal(_canon(naive), _canon(fast), check_dtype=False)
    assert set(zip(naive["conv_id"], naive["turn_idx"])) == {("c1", 0), ("c4", 1)}
    assert naive.set_index("conv_id").loc["c1", "text"] == "reborn"
    assert naive.set_index("conv_id").loc["c4", "text"] == "v2"


def test_fast_normalize_matches_python_on_exotic_whitespace():
    """Every char Python's str.split() treats as whitespace must collapse
    identically in the Arrow twin — incl. vertical tab (absent from RE2's
    ASCII \\s) and the Unicode space blocks."""
    from transcript_cdc.datagen import _normalize_series_arrow, normalize_text_py

    exotic = [
        "a\x0bb", "a\x1c\x1d\x1e\x1fb", "a\x85b", "a\xa0b",
        "a\u1680b", "a\u2000b", "a\u2003b", "a\u200ab",
        "a\u2028b", "a\u2029b", "a\u202fb", "a\u205fb", "a\u3000b",
        " \x0b mixed\t runs \u3000 ", None,
        "e\u0301 combining", "\u200bzwsp\u200b",
        # ordering adversaries: removal creating a NEW base+combining
        # adjacency. normalize_text_py does NFC *first*, so the mark must
        # NOT compose \u2014 an Arrow twin that removed ZWSP/whitespace before
        # NFC would emit the composed form instead.
        "e\u200b\u0301 zwsp-between-base-and-mark",
        "e \u0301 space-between-base-and-mark",
    ]
    want = [normalize_text_py(s) for s in exotic]
    got = list(_normalize_series_arrow(pd.Series(exotic, dtype=object)))
    assert got == want


def test_feed_roundtrip_reproduces_stream(tmp_path):
    spec = StreamSpec(**SPEC_B, events_per_file=3000)
    out = str(tmp_path / "feed")
    info = write_change_feed(spec, out)
    expect = generate_events(StreamSpec(**SPEC_B))
    assert info["n_events"] == len(expect)
    parts = [
        pq.read_table(f).to_pandas()
        for f in sorted(glob.glob(os.path.join(out, "*.parquet")))
    ]
    got = (
        pd.concat(parts, ignore_index=True)
        .sort_values("lsn", kind="stable")
        .reset_index(drop=True)
    )
    # pre-evolution segments legitimately omit model/tokens: nulls after concat
    evo = info["evolution_lsn"]
    assert got.loc[got["lsn"] < evo, "model"].isna().all()
    for c in [c for c in expect.columns if c not in ("model", "tokens")]:
        pd.testing.assert_series_equal(
            got[c], expect[c], check_dtype=False, check_names=False
        )
    post = got["lsn"] >= evo
    pd.testing.assert_series_equal(
        got.loc[post, "model"], expect.loc[post, "model"],
        check_dtype=False, check_names=False,
    )
