#!/usr/bin/env python3
"""Bench telemetry: turn one or two Bench JSON lines into the NOTES perf
section — per-query cold-vs-warm deltas (session-artifact attribution) and,
with a second file, per-query warm ratios vs the reference run.

Usage:
  tools/bench_report.py BENCH_A.json [BENCH_B.json]

Accepts either a raw Bench stdout line or a driver BENCH_r{N}.json wrapper
(whose "tail" field holds the line). Output is markdown, ready to paste.
"""
import json
import re
import sys


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    # driver wrapper: the bench line lives somewhere inside "tail"
    text = d.get("tail", raw) if isinstance(d, dict) else raw
    m = re.search(r'\{"queries_first":.*?"value":[0-9.]+\}', text, re.S)
    if m:
        return json.loads(m.group(0).replace("\\n", "").replace('\\"', '"'))
    # driver tails are head-truncated: recover the per-map fragments
    out = {}
    for key in ("queries_first", "queries"):
        f = re.search(r'\\?"%s\\?":(\{.*?\})' % key, text, re.S)
        if f:
            out[key] = json.loads(f.group(1).replace("\\n", "").replace('\\"', '"'))
    v = re.search(r'\\?"min_total_sec\\?":([0-9.]+)', text)
    c = re.search(r'\\?"value\\?":([0-9.]+)', text)
    for key in ("host_calibration_sec", "host_calibration_end_sec"):
        h = re.search(r'\\?"%s\\?":([0-9.]+)' % key, text)
        if h:
            out[key] = float(h.group(1))
    if "queries" not in out:
        # last resort: a head-truncated tail — reconstruct the warm map
        # from the first intact "qNN...":number entry to its closing brace
        # (queries prints after queries_first, so the surviving map is the
        # warm one; the severed first entry is dropped)
        plain = text.replace("\\n", "").replace('\\"', '"')
        frag = re.search(r'"q[0-9]+[a-z0-9_]*":[0-9.]+(?:,"[^"]+":[0-9.]+)*\}',
                         plain)
        if not frag:
            sys.exit(f"no bench JSON found in {path}")
        out["queries"] = json.loads("{" + frag.group(0))
    if v:
        out["min_total_sec"] = float(v.group(1))
    if c:
        out["value"] = float(c.group(1))
    return out


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    a = load(sys.argv[1])
    warm = a["queries"]
    first = a.get("queries_first", {})
    total_first = sum(first.values()) if first else float(a.get("value", 0))
    total_warm = sum(warm.values())
    print(f"## Bench report: {sys.argv[1]}")
    print(f"- cold first-pass total {total_first:.1f} s, "
          f"warm min-total {total_warm:.1f} s at {len(warm)} queries")
    def calib(d):
        # mean of the start and end probes when both exist (one instant
        # witnesses one instant; the suite's load is better bracketed)
        vals = [d[k] for k in ("host_calibration_sec",
                               "host_calibration_end_sec") if d.get(k)]
        return sum(vals) / len(vals) if vals else None

    if calib(a):
        probes = " + ".join(f"{a[k]:.2f}" for k in
                            ("host_calibration_sec", "host_calibration_end_sec")
                            if a.get(k))
        print(f"- host calibration: {calib(a):.2f} s (probes {probes}; "
              f"fixed seeded sort+hash on all bench threads; scales with "
              f"host load — normalize cross-run ratios by it)")
    if first:
        deltas = sorted(((first[q] - warm[q], q) for q in warm if q in first),
                        reverse=True)
        print("- top cold−warm deltas (session-artifact / fit cost lives here):")
        for d, q in deltas[:10]:
            print(f"    {q:28s} first {first[q]:7.2f}  warm {warm[q]:6.2f}  "
                  f"delta {d:7.2f}")
    slow = sorted(warm.items(), key=lambda kv: -kv[1])[:8]
    print("- slowest warm:", ", ".join(f"{q} {v:.2f}s" for q, v in slow))
    ac = a.get("artifact_cost")
    if isinstance(ac, dict) and ac:
        # once-per-session build costs, recorded by the builds themselves
        # (SessionArtifacts) — the decomposition of the cold-warm deltas
        # above: a big pass-1 reading on an index/fit-backed query is
        # this, not plan cost
        total = a.get("artifact_cost_total", sum(ac.values()))
        top = sorted(ac.items(), key=lambda kv: -kv[1])[:10]
        print(f"- session artifact builds: {total:.1f} s total across "
              f"{len(ac)} builds; top: "
              + ", ".join(f"{k} {v:.1f}s" for k, v in top))
    failed = a.get("failed_queries")
    if failed:
        # a failed query's wall time is a fast ERROR, not a speedup —
        # these are excluded from the verdict's ratio set (r20 review)
        print(f"- !! {len(failed)} QUERIES FAILED during the bench "
              f"(excluded from verdict ratios): {', '.join(failed)}")
    cd = a.get("cold_decomposed")
    if isinstance(cd, list) and cd:
        # per-query cold = attributed builds + plan (r19 #6): the pass-1
        # reading of a build-touching query decomposes in the artifact
        print("- top-10 cold decomposed (cold = builds + plan):")
        for e in cd:
            print(f"    {e['q']:28s} cold {e['cold']:7.2f} = builds "
                  f"{e['builds']:6.2f} + plan {e['plan']:6.2f}")
    v = a.get("verdict")
    if isinstance(v, dict) and "median_ratio_raw" in v:
        # the artifact's own adjudication vs the previous round (r17 #7):
        # Bench computed this at run time from the prior committed artifact
        print(f"- self-verdict vs {v.get('prev')} ({v.get('n_common')} common): "
              f"median ratio raw {v['median_ratio_raw']:.2f}, "
              f"normalized {v.get('median_ratio_norm') if v.get('median_ratio_norm') is not None else 'n/a'}"
              f" (calib {v.get('calib_prev')}/{v.get('calib_cur')})")
        movers = v.get("movers") or []
        if movers:
            # denominator is the FULL raw mover count, not the rendered
            # list (capped at 10) — with >10 raw movers len(movers) would
            # print nonsense like '12/10 confirmed' (r18 ADVICE)
            n_raw = v.get("n_movers_raw", len(movers))
            print(f"- self-verdict movers (raw >=2x and >=0.4s): "
                  f"{v.get('n_movers_confirmed', 0)}/{n_raw} confirmed "
                  f"(normalized AND reproduced by the targeted re-pass)"
                  + (f" (showing {len(movers)} of {n_raw})" if n_raw > len(movers) else ""))
            for m in movers:
                # confirmed now means BOTH gates held: the calibration-
                # normalized ratio AND the automatic targeted re-pass
                # (r19 #1). REFUTED = the re-run read fast again (host
                # noise); host-drift = calibration explained it; a
                # missing gate is conservative (cannot clear a mover).
                c = m.get("confirmed")
                rep = m.get("reproduced")
                if c is True:
                    # conservative paths can confirm WITHOUT a repro
                    # timing — say which evidence actually exists
                    tag = ("CONFIRMED (reproduced)" if rep is True else
                           "CONFIRMED (repro timing missing — conservative)")
                elif c is False:
                    tag = ("REFUTED (targeted re-pass read fast)" if rep is False
                           else "host-drift (calibration-normalized)")
                else:
                    # confirmed is null only in pre-r20 artifacts (no
                    # prev calibration, no repro pass) — a potential
                    # regression, never drift
                    tag = "UNADJUDICATED (pre-adjudication artifact / no prev calibration)"
                rp = m.get("repro")
                print(f"    {m['q']:28s} {m['prev']:6.2f} -> {m['cur']:6.2f}  "
                      f"raw {m['ratio_raw']:.2f}x  norm "
                      f"{m['ratio_norm'] if m['ratio_norm'] is not None else 'n/a'}"
                      f"  repro {f'{rp:.2f}s' if rp is not None else 'n/a'}"
                      f"  {tag}")
        else:
            print("- self-verdict: no raw movers")
    if len(sys.argv) > 2:
        b = load(sys.argv[2])
        bw = b["queries"]
        common = sorted(set(warm) & set(bw))
        if not common:
            sys.exit(f"no common queries between {sys.argv[1]} and "
                     f"{sys.argv[2]} (truncated tail artifact?)")
        ratios = sorted(((warm[q] / bw[q] if bw[q] > 0 else float("inf"), q)
                         for q in common), reverse=True)
        med = sorted(r for r, _ in ratios)[len(ratios) // 2]
        print(f"\n## vs {sys.argv[2]} ({len(common)} common queries)")
        print(f"- suite median warm ratio: {med:.2f} "
              f"(drift band per NOTES: compare medians, not single readings)")
        ca, cb = calib(a), calib(b)
        if ca and cb:
            # times scale ~ with host slowness; dividing each side by its
            # calibration cancels the shared-host drift component
            print(f"- host-normalized median ratio: {med * cb / ca:.2f} "
                  f"(raw {med:.2f} x calib {cb:.2f}/{ca:.2f})")
        else:
            missing = sys.argv[1] if not ca else sys.argv[2]
            print(f"- no host normalization: {missing} lacks "
                  f"host_calibration_sec (pre-r17 artifact)")
        big = [(r, q) for r, q in ratios if r >= 2.0 and warm[q] - bw[q] >= 0.4]
        if big:
            print("- >=2x AND >=0.4s absolute warm regressions:")
            for r, q in big:
                print(f"    {q:28s} {bw[q]:6.2f} -> {warm[q]:6.2f}  ({r:.2f}x)")
        else:
            print("- no >=2x (and >=0.4s absolute) warm regressions")


if __name__ == "__main__":
    main()
