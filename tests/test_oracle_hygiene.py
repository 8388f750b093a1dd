"""Static hygiene gates over the oracle SQL corpus.

Two cross-engine divergence classes have produced (or nearly produced)
red driver rows across rounds; these tests make the sweeps that caught
them permanent:

1. **round() as a rank sort key** — the engines' ``round()`` builtins
   disagree on values landing exactly on a rounding half even when the
   input doubles are bit-identical, which can flip a row_number between
   engines (the r6-advice hybrid_rrf finding). Rank keys must use the
   explicit half-up idiom ``floor(x·10^d + 0.5)/10^d``.
2. **bare decimal literals in all-DECIMAL floor() arithmetic** — DuckDB
   types ``2.4`` as DECIMAL and keeps the arithmetic exact, while
   Spark's ``F.lit(2.4)`` is a float64; ``floor()`` can then differ by
   one (the r6-advice xupsample_repeat finding: 4000 vs 3999). Such
   literals must be CAST AS DOUBLE — or proven exact and whitelisted
   here with the proof.
"""

from __future__ import annotations

import re

from kamu_engine_datafusion_spark.queries import oracles

#: floor() expressions containing a non-0.5 decimal literal with no
#: DOUBLE cast, audited as safe (proof in the value, enforced below so
#: a new occurrence still fails):
#: - xoutliers: 0.6745 * (value - m) — value is a DOUBLE column, so the
#:   DECIMAL literal promotes to DOUBLE at the first multiply; identical
#:   arithmetic to Spark's F.lit(0.6745).
#: - xquality_gate: count(*) * 0.25 — 0.25 is a power of two, exactly
#:   representable in float64, so BIGINT*DECIMAL (exact) and
#:   double(n)*0.25 (also exact for n < 2^52) agree everywhere.
# xoutliers left this list in r14: its 0.6745 MAD constant now rides
# inside _fhu's DOUBLE-cast operand, so the literal gate passes it
_FLOOR_LITERAL_WHITELIST = {"xquality_gate"}


def _floor_exprs(sql: str):
    return re.finditer(r"floor\(([^()]*(?:\([^()]*\)[^()]*)*)\)", sql, re.I)


def test_no_engine_round_in_rank_sort_keys():
    flagged = []
    for key, sql in sorted(oracles().items()):
        if re.search(r"ORDER BY\s+round\(", sql, re.I) or re.search(
            r"OVER\s*\([^)]*\bround\(", sql, re.I
        ):
            flagged.append(key)
    assert not flagged, (
        f"oracles ranking on engine round() (use half-up floor idiom): {flagged}"
    )


#: round()-derived aliases later used as sort keys, audited as safe
#: (proof required; the r7-advice escape was `round(..., 9) AS k ...
#: ORDER BY k` — lexically clean ORDER BY, divergent rank key):
_ROUND_ALIAS_RANK_WHITELIST: set[tuple[str, str]] = set()

#: `round(...) AS alias` with up to two levels of nested parens.
_ROUND_ALIAS = re.compile(
    r"\bround\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*\)\s+AS\s+(\w+)", re.I
)


def test_no_round_derived_columns_as_rank_sort_keys():
    """The lexical sweep above misses a round() that lands in a prior
    CTE: `round(...) AS k` then `ORDER BY k` is the same divergence
    class one hop removed (the r7-advice xsample_weighted finding).
    Track aliases assigned from round() and flag any used in an ORDER
    BY — window or final — unless whitelisted with a proof."""
    flagged = []
    for key, sql in sorted(oracles().items()):
        defs: dict[str, int] = {}
        for m in _ROUND_ALIAS.finditer(sql):
            a = m.group(1)
            defs[a] = min(defs.get(a, m.start()), m.start())
        for alias, dpos in sorted(defs.items()):
            if (key, alias) in _ROUND_ALIAS_RANK_WHITELIST:
                continue
            uses = [
                m.start()
                for pat in (
                    rf"OVER\s*\([^)]*ORDER BY[^)]*\b{alias}\b",
                    rf"ORDER BY\s+[^()]*?\b{alias}\b",
                )
                for m in re.finditer(pat, sql, re.I)
            ]
            # Only a DEFINITION lexically before the sort usage can
            # feed it through a CTE; a round() in the final display
            # select (after every ORDER BY on that name) is the
            # standard post-ranking display round, not a rank key.
            if any(u > dpos for u in uses):
                flagged.append((key, alias))
    assert not flagged, (
        "round()-derived columns used as rank/sort keys (use the "
        f"half-up floor idiom on both sides): {flagged}"
    )


def test_floor_decimal_literals_cast_or_whitelisted():
    flagged = []
    for key, sql in sorted(oracles().items()):
        if key in _FLOOR_LITERAL_WHITELIST:
            continue
        for m in _floor_exprs(sql):
            inner = m.group(1)
            lits = [
                x
                for x in re.findall(r"(?<![\w.])\d+\.\d+(?![\w.])", inner)
                if x != "0.5"
            ]
            if lits and "DOUBLE" not in inner:
                flagged.append((key, lits))
                break
    assert not flagged, (
        "floor() over bare DECIMAL literals without a DOUBLE cast — the "
        f"xupsample_repeat divergence class: {flagged}"
    )


def test_whitelist_entries_still_exhibit_the_pattern():
    """A whitelisted key that no longer contains the pattern is stale —
    prune it so the whitelist can't silently grow protective cover."""
    orc = oracles()
    for key in _FLOOR_LITERAL_WHITELIST:
        sql = orc[key]
        hit = any(
            [
                x
                for x in re.findall(
                    r"(?<![\w.])\d+\.\d+(?![\w.])", m.group(1)
                )
                if x != "0.5"
            ]
            and "DOUBLE" not in m.group(1)
            for m in _floor_exprs(sql)
        )
        assert hit, f"whitelist entry {key} is stale — remove it"


# r14 (verdict item 5): the inline floor-half-up construction has now
# produced oracle divergences three times (r8 xupsample_repeat, two r13
# staged drafts, two r14 drafts — the last four caught pre-driver by
# the tests above). ALL legacy sites were converted to
# queries.pipeline._fhu() in r14 (every affected oracle re-verified
# hash-green at sf0.001 + sf0.01); this ratchet holds the inline count
# at ZERO — any new hand-written site fails here. Write _fhu(expr, dp).
_INLINE_FLOOR_HALF_UP_PIN = 0


def test_inline_floor_half_up_ratchet():
    import os

    src_path = os.path.join(
        os.path.dirname(__file__),
        "..",
        "kamu_engine_datafusion_spark",
        "queries",
        "pipeline.py",
    )
    with open(src_path) as f:
        src = f.read()
    # the display-round signature: `+ 0.5) / <digit>` — optionally
    # split across adjacent string literals; quantization floors
    # (`+ 0.5) AS BIGINT`, no divide) are a different idiom and the
    # cast gate above polices their literals
    # divisor must terminate at a non-identifier boundary so the
    # python-side math.floor replays (10_000) and the _fhu docstring
    # (10^d) don't count — only SQL-text constructions do
    n = len(re.findall(r'\+ 0\.5\) ["]?\s*["]?/ \d+(?:\.\d+)?(?![\w^.])', src))
    assert n <= _INLINE_FLOOR_HALF_UP_PIN, (
        f"{n} inline floor-half-up constructions in pipeline.py "
        f"(pin: {_INLINE_FLOOR_HALF_UP_PIN}) — write new rounding "
        "through _fhu(expr, dp) instead; it emits the DOUBLE-cast "
        "form the cross-engine hash requires"
    )
