"""Run the bench suite and write the per-round artifact file.

Wraps ``bench_suite.py`` (the five BASELINE.json driver configs): captures
the one-JSON-line-per-config stream it prints and assembles
``benchmarks/BENCH_SUITE_<tag>.json`` in the same shape as the r02
artifact, so each round's numbers are directly comparable.

Usage::

    python benchmarks/collect_suite.py r03 [config ...]

Existing configs in the artifact are upserted, so a partial run (e.g.
after a tunnel stall) refreshes only the configs it completed.
"""
import datetime
import io
import json
import pathlib
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

NOTE = ("round latencies are steady-state (mean of last 2 rounds from the "
        "engine's query_times.txt journal); first_round_incl_compile shows "
        "the one-time XLA compile cost. Configs 1 and 4 run on the denser "
        "learnable synthetics (n_blobs>=10) so final_f/dice carry a real "
        "quality signal alongside latency (r02 weak #5).")


def main():
    import bench_suite

    tag = sys.argv[1] if len(sys.argv) > 1 else "r03"
    which = sys.argv[2:]
    path = os.path.join(HERE, f"BENCH_SUITE_{tag}.json")

    out = {
        "hardware": "TPU v5e (axon tunnel, single chip; "
                    "mesh {data:1,model:1})",
        "date": datetime.date.today().isoformat(),
        "note": NOTE,
        "configs": [],
    }
    if os.path.exists(path):
        out = json.load(open(path))
        out["date"] = datetime.date.today().isoformat()
        out["note"] = NOTE

    def upsert(line):
        line = line.strip()
        if not line.startswith("{"):
            return
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            return
        if "config" not in rec:
            return
        out["configs"] = ([c for c in out["configs"]
                           if c["config"] != rec["config"]] + [rec])
        # str key: config ids are ints plus variant strings ("5fi")
        out["configs"].sort(key=lambda c: str(c["config"]))
        pathlib.Path(path).write_text(json.dumps(out, indent=1) + "\n")

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        """Upsert each completed JSON line as it is printed, so a
        mid-suite tunnel stall (or kill) keeps every config that DID
        finish — the artifact's partial-run claim depends on this
        happening before bench_suite.main() returns."""

        def write(self, s):
            buf.write(s)
            sys.stderr.write(s)
            while "\n" in buf.getvalue():
                head, rest = buf.getvalue().split("\n", 1)
                buf.seek(0)
                buf.truncate()
                buf.write(rest)
                upsert(head)
            return len(s)

    sys.argv = ["bench_suite.py"] + which
    with redirect_stdout(Tee()):
        bench_suite.main()
    upsert(buf.getvalue())  # unterminated final line, if any

    pathlib.Path(path).write_text(json.dumps(out, indent=1) + "\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
