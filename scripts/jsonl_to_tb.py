"""Convert an existing metrics.jsonl run log into a TensorBoard event file.

New runs write event files natively (utils/metrics.py MetricsLogger); this
backfills runs recorded before that, restoring the reference's TensorBoard
workflow (reference: README.md:86-89) for old checkpoint dirs.

Usage: python scripts/jsonl_to_tb.py <checkpoint-dir> [<logdir>]
"""

import json
import sys

sys.path.insert(0, ".")

from self_attention_tacotron_tpu.utils.tb_events import EventWriter  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    import os
    src = sys.argv[1]
    jsonl = src if src.endswith(".jsonl") else os.path.join(
        src, "metrics.jsonl")
    logdir = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(jsonl)
    writer = EventWriter(logdir)
    n = 0
    with open(jsonl) as f:
        for line in f:
            if not line.strip():
                continue
            entry = json.loads(line)
            step = int(entry.pop("step"))
            wall_time = float(entry.pop("time", 0.0)) or None
            scalars = {k: float(v) for k, v in entry.items()
                       if isinstance(v, (int, float))}
            if scalars:
                writer.add_scalars(step, scalars, wall_time=wall_time)
                n += 1
    writer.close()
    print(f"wrote {n} events to {writer.path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
