#!/usr/bin/env python3
"""Adjudicate the x64 scaling point against the x30 certification.

Usage:
  python3 tools/adjudicate_x64.py [BENCH_X64_r14.json] [BENCH_X30_r14.json] \
      [probe_x30.json] [probe_x64.json]

Two readings:

1. AVERAGE exponents (the artifact's `scaling` column): e(x) =
   log(T_x/T_1)/log(x). Sensitive to the x1 denominator's window, so a
   fast x1 group mechanically raises every exponent; read it together
   with the absolute runtimes.

2. MARGINAL slope over [30, 64]: m = log(T_64/T_30)/log(64/30) - the
   actual new information the x64 point adds. Cross-artifact marginals
   conflate windows; when paired same-window probes are supplied, the
   probe marginals are authoritative. The scale sentinel (a fixed
   groupBy+agg shuffle, linear by construction) measures the HOST's
   own 30->64 response: its marginal m_s > 1 means the host (page
   cache shrinking as heap grows while data doubles, GC regime) turned
   super-linear, and operator marginals are read normalized:
   m_norm = m - (m_s - 1).

Verdicts on m_norm: <= 1.0 certifies the plan through x64 (sub-linear
once the host's own response is removed); > 1.15 is a candidate plan
cliff (adjudicate in the operator's stage graph).
"""
import json
import math
import os
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # survive `| head`


def arg(i, default):
    return sys.argv[i] if len(sys.argv) > i else default


def load(path):
    return json.load(open(path)) if path and os.path.exists(path) else None


a64 = json.load(open(arg(1, "BENCH_X64_r14.json")))
a30 = json.load(open(arg(2, "BENCH_X30_r14.json")))
p30 = load(arg(3, "bench-archive/PROBE_X30_samewindow_r14.json"))
p64 = load(arg(4, "bench-archive/PROBE_X64_samewindow_r14.json"))

LOG = math.log10(64 / 30)


def marginal(t30, t64):
    return math.log10(t64 / t30) / LOG if t30 and t64 else float("nan")


s64, s30 = a64["scaling"], a30["scaling"]
q64, q30 = a64["queries"], a30["queries"]
print(f"x64 artifact host={a64['host']} class={a64.get('host_class')}")
print(f"x30 artifact host={a30['host']} class={a30.get('host_class')}")

# sentinel marginal: prefer paired probes (same window), fall back to
# the artifacts' in-context readings
if p30 and p64:
    s30t = p30["scale_sentinel"]["x30"]
    s64t = p64["scale_sentinel"]["x64"]
    src = "paired probes"
else:
    s30t = a30["scale_sentinel"]["x30"]
    s64t = a64["scale_sentinel"]["x64"]
    src = "cross-artifact (window-conflated)"
m_s = marginal(s30t, s64t)
print(f"sentinel marginal 30->64: {m_s:.3f} ({src}: {s30t:.2f}s -> {s64t:.2f}s)")
print(f"{'row':28s} {'e30':>6s} {'e64':>6s} {'t30':>8s} {'t64':>8s} "
      f"{'marg':>6s} {'norm':>6s}  verdict")
rows = sorted(set(s64) | set(s30))
for r in rows:
    # paired-probe values override artifact values when present
    t30 = (p30 or {}).get("queries", {}).get(f"{r}_x30", q30.get(f"{r}_x30"))
    t64 = (p64 or {}).get("queries", {}).get(f"{r}_x64", q64.get(f"{r}_x64"))
    m = marginal(t30, t64)
    mn = m - (m_s - 1.0)
    v = ("CERTIFIES" if mn <= 1.0 else
         "WATCH" if mn <= 1.15 else "PLAN-CLIFF?")
    e30 = s30.get(r, float("nan"))
    e64 = s64.get(r, float("nan"))
    probed = "*" if (p30 or {}).get("queries", {}).get(f"{r}_x30") else " "
    print(f"{r:27s}{probed} {e30:6.3f} {e64:6.3f} {t30 or float('nan'):8.2f} "
          f"{t64 or float('nan'):8.2f} {m:6.3f} {mn:6.3f}  {v}")
print("* = same-window probe pair (authoritative); others cross-artifact")
