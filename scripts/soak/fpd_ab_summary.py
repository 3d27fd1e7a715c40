"""Summarize the FPD efficacy A/B (scripts/soak/fpd_ab.sh) from run logs.

Prints a markdown table of val PCK over epochs for the plain student vs
the KD student (same seed / steps / data), plus teacher context.

Usage: python scripts/soak/fpd_ab_summary.py
"""

from __future__ import annotations

import glob
import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")


def newest_log(pattern: str) -> str | None:
    runs = sorted(glob.glob(os.path.join(ROOT, pattern)),
                  key=os.path.getmtime)
    return runs[-1] if runs else None


def pck_series(log_path: str) -> list[float]:
    """Per-epoch student val PCK from a run log.

    fpd_train logs two pre-train validations (teacher, then untrained
    student); each prints its "overall PCK" line immediately BEFORE its
    "=> teacher perf" / "=> student perf" summary marker.  Dropping is
    therefore positional: a marker retracts the most recent PCK entry.
    (A supervised restart appends a fresh pre-train pair mid-file to the
    same running.log — a count-dropped-from-the-front scheme would then
    discard real trained-student entries instead.)
    """
    out = []
    with open(log_path) as f:
        for line in f:
            if "=> teacher perf" in line or "=> student perf" in line:
                if out:
                    out.pop()
                continue
            m = re.search(r"overall PCK ([0-9.]+)", line)
            if m:
                out.append(float(m.group(1)))
    return out


def main() -> None:
    runs = {
        "teacher": "output/fpd_ab/synthetic/hourglass/*/running.log",
        "plain": "output/fpd_ab_plain/synthetic/hourglass/*/running.log",
        "kd": "output/fpd_ab_kd/synthetic/hourglass/*/running.log",
        # second-seed replica (r3_queue2.sh, TRAIN.SEED 1)
        "plain_s1": "output/fpd_ab_plain_s1/synthetic/hourglass/*/running.log",
        "kd_s1": "output/fpd_ab_kd_s1/synthetic/hourglass/*/running.log",
    }
    series = {}
    for name, pat in runs.items():
        log = newest_log(pat)
        if not log:
            print(f"({name}: no run found for {pat})")
            continue
        series[name] = (log, pck_series(log))

    for name, (log, s) in series.items():
        tail = " ".join(f"{v:.3f}" for v in s[-8:])
        best = max(s) if s else float("nan")
        print(f"{name:8s} best {best:.4f}  last8: {tail}   ({log})")

    for suffix, label in [("", "seed 0"), ("_s1", "seed 1")]:
        pk, kk = "plain" + suffix, "kd" + suffix
        if pk not in series or kk not in series:
            continue
        pb = max(series[pk][1]) if series[pk][1] else 0.0
        kb = max(series[kk][1]) if series[kk][1] else 0.0
        pf = series[pk][1][-1] if series[pk][1] else 0.0
        kf = series[kk][1][-1] if series[kk][1] else 0.0
        print()
        print(f"| student ({label}) | best val PCK | final val PCK |")
        print("|---|---|---|")
        print(f"| plain (GT only) | {pb:.4f} | {pf:.4f} |")
        print(f"| + FPD distillation | {kb:.4f} | {kf:.4f} |")
        print(f"\nKD delta ({label}): best {kb - pb:+.4f}, "
              f"final {kf - pf:+.4f}")


if __name__ == "__main__":
    main()
