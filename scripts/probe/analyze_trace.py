"""Summarize a jax.profiler xplane trace: top device ops by self time.

Uses tensorflow's _pywrap_profiler_plugin.xspace_to_tools_data to convert
the xplane.pb to framework_op_stats / op_profile JSON (no xplane_pb2 needed).

Usage: python analyze_trace.py /tmp/w32_trace [n_rows]
"""

import glob
import json
import sys

from tensorflow.python.profiler.internal import _pywrap_profiler_plugin as pp


def main():
    trace_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, success = pp.xspace_to_tools_data([paths[0]], "framework_op_stats", {})
    if not success:
        raise SystemExit("framework_op_stats failed")
    tables = json.loads(data.decode() if isinstance(data, bytes) else data)
    table = tables[0]
    cols = [c["id"] for c in table["cols"]]
    rows = [dict(zip(cols, [c["v"] if isinstance(c, dict) else c
                            for c in r["c"]]))
            for r in table["rows"]]
    dev = [r for r in rows if r["host_or_device"] == "Device"]
    dev.sort(key=lambda r: -float(r["total_self_time"]))
    tot = sum(float(r["total_self_time"]) for r in dev)
    print(f"device total self-time {tot/1e3:.3f} ms over {len(dev)} op types")
    print(f"{'self_ms':>9} {'%':>5} {'x':>5} {'GF/s':>8} {'GB/s':>7} "
          f"{'bound':<7} name")
    for r in dev[:n]:
        ms = float(r["total_self_time"]) / 1e3
        print(f"{ms:9.3f} {100*float(r['total_self_time'])/tot:5.1f} "
              f"{int(r['occurrences']):5d} "
              f"{float(r.get('model_flop_rate') or 0):8.0f} "
              f"{float(r.get('measured_memory_bw') or 0):7.0f} "
              f"{str(r.get('bound_by') or ''):<7} "
              f"{r['operation'][:90]}")


if __name__ == "__main__":
    main()
