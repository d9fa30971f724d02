"""Diff two bench outputs and flag regressions.

    python tools/bench_compare.py OLD.json NEW.json [threshold_pct]

Accepts either the raw one-line JSON ``bench.py`` prints or the driver's
``BENCH_r{N}.json`` wrapper (uses its ``parsed`` field). Compares every
shared numeric metric (including the nested ``queries`` /
``curation_ops`` / ``alignment_ops`` dicts); prints metrics whose NEW
value is worse than OLD by more than the threshold (default 25% — below
that is routine machine-load variance on this box, see COVERAGE.md's
round-6 notes). For timing metrics bigger is worse; ``*_acc`` /
``*_recall*`` / ``*_ratio`` metrics treat smaller as worse. Exit 1 if
anything regressed.

Where BOTH files carry a measured ``bands`` entry for a query (bench.py
emits [min, max] over its 3 timed runs), the band is the regression
test: a query regresses only if the bands are DISJOINT with new.min
above old.max (overlapping bands = the runs are drawn from the same
machine-load distribution, whatever the min-to-min delta says).

Where BOTH files carry ``canary_local1_sec`` (a fixed single-task Spark
workload measuring the box's per-core throughput, nothing repo-specific),
every timing metric's NEW value — and its band — is divided by the canary
drift ratio before comparison: a 1.3-2x host-throughput swing between
measurement windows then cancels instead of flagging unchanged code
(VERDICT r6 adjudicated four such false regressions).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    parsed = d.get("parsed", d)
    scavenged = False
    if parsed is None and isinstance(d.get("tail"), str):
        # driver wrapper with parsed=null: the tail may hold the one-line
        # JSON intact (progress noise before it) or HEAD-TRUNCATED (the
        # driver keeps only the last N chars). Try a clean parse first,
        # then scavenge whatever complete sub-dicts / scalar pairs survive
        # so cross-round comparison degrades gracefully instead of dying.
        line = d["tail"].strip().rsplit("\n", 1)[-1]
        start = line.find("{")
        if start >= 0:
            try:
                parsed = json.loads(line[start:])
            except json.JSONDecodeError:
                # empty recovery must NOT silently compare as "no shared
                # metrics → no regressions" — treat it as unusable
                parsed = _scavenge(line) or None
                scavenged = parsed is not None
    if scavenged:
        # prefer the full sibling artifact bench.py writes (BENCH_LOCAL
        # .json, VERDICT r7 #3) — but ONLY when it is provably the SAME
        # RUN as the truncated wrapper: both files come from one bench.py
        # invocation, so every scavenged scalar must match exactly. The
        # cross-check matters because the sibling is overwritten each
        # round — an OLD round's wrapper must never silently adopt the
        # NEW round's numbers (that would compare a run against itself).
        import os

        local = os.path.join(
            os.path.dirname(os.path.abspath(path)), "BENCH_LOCAL.json"
        )
        if os.path.exists(local):
            with open(local) as fh:
                full = json.load(fh)
            flat_p, flat_f = _flatten(parsed), _flatten(full)
            shared = [k for k in flat_p if k in flat_f]
            if len(shared) >= 3 and all(
                abs(flat_p[k] - flat_f[k]) < 1e-9 for k in shared
            ):
                print(
                    f"note: {path} is truncated; using same-run "
                    f"BENCH_LOCAL.json ({len(shared)} scavenged scalars "
                    "cross-checked)"
                )
                return full
    if parsed is None:
        raise SystemExit(f"{path}: no parsable bench JSON (parsed=null)")
    return parsed


def _scavenge(frag: str) -> dict:
    """Rebuild what metrics survive in a head-truncated one-line bench JSON:
    every complete flat sub-dict ("name": {...}) and every top-level scalar
    pair. Nested values inside the sub-dicts are scalars or [lo, hi] bands,
    which json.loads handles once the braces balance."""
    import re

    out: dict = {}
    for m in re.finditer(r'"(\w+)":\s*\{', frag):
        name, depth, i = m.group(1), 0, m.end() - 1
        for j in range(i, len(frag)):
            depth += frag[j] == "{"
            depth -= frag[j] == "}"
            if depth == 0:
                try:
                    out[name] = json.loads(frag[i : j + 1])
                except json.JSONDecodeError:
                    pass
                break
    # Top-level detection must survive HEAD truncation: the fragment ends
    # at the root close (absolute depth 0), so depth_abs(pos) =
    # bal(pos) - bal(end) and root-dict keys sit at depth_abs == 1 —
    # a prefix-only brace count would promote nested keys when the
    # truncation ate their opening braces.
    b_total = frag.count("{") - frag.count("}")
    for m in re.finditer(r'"(\w[\w.]*)":\s*(-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)', frag):
        pre = frag[: m.start()]
        if pre.count("{") - pre.count("}") - b_total == 1:
            out.setdefault(m.group(1), float(m.group(2)))
    return out


def _flatten(d: dict, prefix: str = "") -> dict[str, float]:
    out: dict[str, float] = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}."))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            out[f"{prefix}{k}"] = float(v)
    return out


def _higher_is_better(name: str) -> bool:
    short = name.rsplit(".", 1)[-1]
    if short == "ep2_big_ratio":
        # spark_sec / pandas_sec — LOWER is better, unlike recall-style
        # ratios; without this carve-out an improvement flags as regressed
        return False
    return any(
        t in short
        for t in ("_acc", "recall", "_ratio", "mb_per", "scale_factor", "modularity")
    )


_TIMING_DICTS = (
    # nested dicts whose every row is a wall-clock timing in seconds
    # (rows are bare query names, no _sec suffix)
    "queries", "tpch_ops", "sketch_graph_ops", "curation_ops", "alignment_ops",
)


def _is_timing(name: str) -> bool:
    """Rows with a time dimension — the ONLY rows canary normalization
    may touch (VERDICT r8 #3: unitless counters got divided by the drift
    factor and flagged at raw +0.0%)."""
    short = name.rsplit(".", 1)[-1]
    if short.endswith("_sec") or name == "value":
        return True
    head = name.split(".", 1)[0]
    return "." in name and head in _TIMING_DICTS


def _is_context(name: str) -> bool:
    """Structural/diagnostic rows that are neither better nor worse in a
    direction: fixture sizes and counts (a Louvain run finding MORE
    communities flagged as a 117% 'regression' in r7→r8), and ratios of
    two load-sensitive timings whose direction is ambiguous."""
    short = name.rsplit(".", 1)[-1]
    if short in (
        "nodes", "edges", "rows", "base_rows", "n_eff", "build_sec",
        "planted_communities", "code_bytes", "ann_ivfpq_opq_code_bytes",
        "ep2_big_rows", "ep2_scale_factor_8x", "uncapped_over_capped",
        "sf",
        # time-over-time ratios of two load-sensitive rows — direction
        # ambiguous under load skew; the _sec rows themselves are scored
        "delta_vs_recompute_ratio", "keys_unknown_vs_known_ratio",
        "sidecar_flat_ratio",
    ):
        return True
    return (
        short.endswith("_communities")
        or short.endswith("_files_scanned")
        or short.endswith("_files")
    )


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old_raw, new_raw = _load(sys.argv[1]), _load(sys.argv[2])
    old, new = _flatten(old_raw), _flatten(new_raw)
    old_bands = old_raw.get("bands") or {}
    new_bands = new_raw.get("bands") or {}
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    # Load-context guard (VERDICT r5 #5): when the two runs recorded
    # materially different machine load (either end of either run), a
    # timing delta is a load artifact, not a code regression — report
    # deltas as usual but exit 0, with the suppression stated loudly.
    def _peak_load(d: dict) -> float | None:
        vals = [d.get("loadavg_1m_start"), d.get("loadavg_1m_end")]
        vals = [v for v in vals if isinstance(v, (int, float))]
        return max(vals) if vals else None

    lo, ln = _peak_load(old_raw), _peak_load(new_raw)
    load_skewed = (
        lo is not None and ln is not None and abs(ln - lo) > max(4.0, 0.5 * max(lo, ln))
    )
    if load_skewed:
        print(
            f"LOAD MISMATCH: old peak loadavg {lo} vs new {ln} — timing deltas "
            "below are reported for context but NOT counted as regressions; "
            "re-run bench.py on a quiet box to compare."
        )
    # Taint guard (VERDICT r8 #2): bench.py stamps tainted=true when the
    # run STARTED on a loaded box (loadavg_1m_start > 1) — its timings
    # are contaminated end to end, so deltas print for context but are
    # never scored (the r8 driver artifact's 17 flags were exactly this).
    def _is_tainted(d: dict) -> bool:
        if "tainted" in d:
            return bool(d["tainted"])
        # pre-r9 artifacts lack the stamp — derive it from the recorded
        # start load so the r8 driver run (loadavg 3.02) scores as what
        # it was: a loaded box, not 17 regressions
        ls = d.get("loadavg_1m_start")
        return isinstance(ls, (int, float)) and ls > 1.0

    tainted_sides = [
        side for side, d in (("old", old_raw), ("new", new_raw)) if _is_tainted(d)
    ]
    if tainted_sides:
        print(
            f"TAINTED ARTIFACT ({', '.join(tainted_sides)}): run started on a "
            "loaded box — TIMING deltas below are context only, not scored as "
            "regressions (accuracy/recall/error rows are load-invariant and "
            "stay scored); re-run bench.py on a quiet box."
        )
        load_skewed = True
    # Canary normalization: factor = how much SLOWER the new box ran the
    # fixed single-task workload. Timing rows divide by it, throughput
    # (mb_per) rows multiply; accuracy/recall and time-over-time ratios
    # are load-invariant and stay raw. A factor outside [1/3, 3] means
    # something other than load changed — refuse to normalize by it.
    oc, nc = old.get("canary_local1_sec"), new.get("canary_local1_sec")
    factor = None
    if oc and nc and 1 / 3 <= nc / oc <= 3.0:
        factor = nc / oc
        if abs(factor - 1) > 0.10:
            print(
                f"CANARY: single-core drift {oc} -> {nc} "
                f"(x{factor:.2f}) — timing deltas normalized by it."
            )
    # context rows, not metrics: the canary IS the load measurement and
    # loadavg is ambient — neither can "regress"
    context_rows = {"canary_local1_sec", "loadavg_1m_start", "loadavg_1m_end"}
    regressed = []
    for name in sorted(set(old) & set(new)):
        if name in context_rows or _is_context(name):
            continue
        o, n = old[name], new[name]
        if o == 0:
            continue
        short = name.rsplit(".", 1)[-1]
        n_eff, band_scale = n, 1.0
        # Canary-normalize ONLY rows with a time dimension (VERDICT r8
        # #3: unitless counters like hot_slot_members / hll_rel_err were
        # flagged "+26% REGRESSED" at raw +0.0% because the divisor
        # applied to everything lower-is-better). `*_sec` divides by the
        # drift; `mb_per*` throughput multiplies; everything else —
        # counts, error rates, accuracies, ratios — compares raw.
        if factor is not None and short != "canary_local1_sec":
            if _is_timing(name):
                n_eff, band_scale = n / factor, 1 / factor
            elif "mb_per" in short:
                # symmetric with the timing branch: the band-overlap check
                # below compares the normalized point against nb[0] *
                # band_scale, so throughput bands must scale by the SAME
                # drift factor as n_eff or drift mis-flags/mis-clears them
                n_eff, band_scale = n * factor, factor
        delta_pct = (n_eff - o) / abs(o) * 100
        raw_pct = (n - o) / abs(o) * 100
        worse = -delta_pct if _higher_is_better(name) else delta_pct
        flagged = worse > threshold
        note = "" if n_eff == n else f"  (raw {raw_pct:+.1f}%, canary-normalized)"
        ob, nb = old_bands.get(short), new_bands.get(short)
        if flagged and ob and nb:
            # measured variance beats the fixed threshold: only a band
            # fully above the old one is a real slowdown (new band scaled
            # by the canary drift first)
            nb_lo = nb[0] * band_scale
            if nb_lo <= ob[1]:
                flagged = False
                note += f"  (bands overlap: old<= {ob[1]}, new>= {round(nb_lo, 3)})"
            else:
                note += f"  (bands disjoint: old<= {ob[1]}, new>= {round(nb_lo, 3)})"
        # load/taint suppression applies only to LOAD-SENSITIVE rows:
        # timings, throughput, and timing-over-timing ratios. Accuracy /
        # recall / error-rate rows cannot be load artifacts — a tainted
        # run's quality drop is still a regression.
        load_sensitive = (
            _is_timing(name) or "mb_per" in short or short.endswith("_ratio")
        )
        suppressed = flagged and load_skewed and load_sensitive
        marker = (
            ""
            if not flagged
            else (" <-- tainted, not scored" if suppressed else " <-- REGRESSED")
        )
        if marker or abs(delta_pct) > threshold / 2:
            print(
                f"{name:45s} {o:>12.3f} -> {n:>12.3f}  {delta_pct:+7.1f}%{marker}{note}"
            )
        if flagged and not suppressed:
            regressed.append(name)
    if regressed:
        print(f"\n{len(regressed)} metrics regressed past {threshold}%")
        sys.exit(1)
    print(f"\nno regressions past {threshold}%")


if __name__ == "__main__":
    main()
