#!/usr/bin/env python
"""Regenerate pintron_tpu/native/pwm_tables.h from pwm_data.py.

The C tables must round-trip the exact float64 values the Python tables
hold (repr() of a float is shortest-exact), so the native MatInspector
scores are bit-identical to the host path.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from pintron_tpu.factorize.pwm_data import PWM, CV, MAXV  # noqa: E402

NAMES = ["BPS_9", "BPS_10", "P5_GTAG_U12", "P5_ATAC_U12", "P5_GTAG_U2",
         "P5_GCAG_U2"]


def main():
    out = []
    out.append("/* Generated from pintron_tpu/factorize/pwm_data.py (tables")
    out.append(" * transcribed from reference src/classify-intron.c:665-1553).")
    out.append(" * Regenerate with tools/gen_pwm_tables.py after editing")
    out.append(" * pwm_data.py.  Only the matrices the native itype")
    out.append(" * classification needs are emitted. */")
    out.append("")
    for name in NAMES:
        L = len(CV[name])
        out.append(f"#define PWM_{name}_L {L}")
        out.append(f"static const double PWM_{name}[4][{L}] = {{")
        for r in range(4):
            row = ", ".join(repr(float(v)) for v in PWM[name][r][:L])
            out.append(f"    {{{row}}},")
        out.append("};")
        out.append(f"static const double CV_{name}[{L}] = {{")
        out.append("    " + ", ".join(repr(float(v)) for v in CV[name]) + "};")
        out.append(f"static const double MAXV_{name}[{L}] = {{")
        out.append("    " + ", ".join(repr(float(v)) for v in MAXV[name])
                   + "};")
        out.append("")
    path = os.path.join(os.path.dirname(__file__), "..", "pintron_tpu",
                        "native", "pwm_tables.h")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
