"""Per-stage training-rate summary from a StageRunner log.

Parses the `[stage <tag>] step N/M g=.. d=.. R rounds/s` lines that
StageRunner prints (stage_runner.py:798-800) and reports the median
steady-state rate per stage (head of each stage is skipped: it amortizes
the jit compile through the axon tunnel). imgs/s = rounds/s x batch
(one TwinGAN round consumes one batch per domain pair; same convention
as docs/PERFORMANCE.md train tables).

    python tools/stage_rates.py /tmp/qc256.log --batch_schedule 256=16,default=8
"""

import argparse
import collections
import re
import statistics
import sys

LINE = re.compile(
    r"\[stage (\S+)\] step (\d+)/(\d+) g=\S+ d=\S+ ([\d.]+) rounds/s")


def parse(path: str, skip_steps: int):
    rates = collections.OrderedDict()
    totals = {}
    for line in open(path):
        m = LINE.match(line.strip())
        if not m:
            continue
        tag, cur, tot, r = (m.group(1), int(m.group(2)), int(m.group(3)),
                            float(m.group(4)))
        totals[tag] = tot
        if cur > skip_steps:
            rates.setdefault(tag, []).append(r)
    return rates, totals


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log")
    p.add_argument("--skip_steps", type=int, default=400,
                   help="ignore rate samples at/below this step (compile)")
    p.add_argument("--batch_schedule", default="",
                   help="res=batch[,res=batch...][,default=N] to also print "
                   "imgs/s (stage resolution = trailing int of the tag)")
    args = p.parse_args(argv)

    sched = {}
    default_b = 0
    if args.batch_schedule:
        for part in args.batch_schedule.split(","):
            k, v = part.split("=")
            if k == "default":
                default_b = int(v)
            else:
                sched[int(k)] = int(v)

    rates, totals = parse(args.log, args.skip_steps)
    if not rates:
        print("no rate lines found", file=sys.stderr)
        return 1
    print(f"{'stage':>12} {'steps':>7} {'median r/s':>10} {'imgs/s':>8}")
    for tag, rs in rates.items():
        med = statistics.median(rs)
        res = int(tag.split("to")[-1])
        b = sched.get(res, default_b)
        imgs = f"{med * b:8.1f}" if b else " " * 8
        print(f"{tag:>12} {totals[tag]:>7} {med:>10.2f} {imgs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
