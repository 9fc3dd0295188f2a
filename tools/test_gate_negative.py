#!/usr/bin/env python3
"""Negative fixture for tools/check_oracles.py's hardened raise paths
(VERDICT r10 item 2's literal done-criterion; r11 "What's wrong" 1).

The 448-query happy path proves the gate passes good dumps; nothing proved
the two r11 raise paths FIRE. This script builds a synthetic verify dump
containing

  * q_fixture_ok      — value-, type-, and schema-clean   -> must stay OK
  * q_fixture_decimal — decimal128 output column whose oracle twin is ALSO
                        decimal (types equal, values equal — only the
                        no-DECIMAL check can catch it)  -> must FAIL
  * q_fixture_drift   — int32 output vs BIGINT oracle with equal values
                        (only the type-drift check can catch it) -> must FAIL

then runs check_oracles.py and asserts the exact classification. A
regression that reorders the checks, typos the startswith("decimal") probe,
or downgrades either raise to a warn flips one of these asserts.

Run standalone (`python3 tools/test_gate_negative.py`) or via the
GateNegativeSpec shell-out inside the default `sbt test`.
"""
import json
import os
import subprocess
import sys
import tempfile
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
CHECKER = os.path.join(HERE, "check_oracles.py")
SF = "/root/testdata/sf0.001"  # only used for the gate's table views


def build_dump(outdir: str) -> None:
    oracles = {
        "q_fixture_ok": "SELECT CAST(1 AS BIGINT) AS a",
        "q_fixture_decimal": "SELECT CAST(1 AS DECIMAL(38,0)) AS a",
        "q_fixture_drift": "SELECT CAST(1 AS BIGINT) AS a",
    }
    with open(os.path.join(outdir, "oracle_sql.json"), "w") as f:
        json.dump(oracles, f)

    def w(name: str, table: pa.Table) -> None:
        d = os.path.join(outdir, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "part-00000.parquet"))

    w("q_fixture_ok", pa.table({"a": pa.array([1], pa.int64())}))
    w("q_fixture_decimal",
      pa.table({"a": pa.array([Decimal("1")], pa.decimal128(38, 0))}))
    w("q_fixture_drift", pa.table({"a": pa.array([1], pa.int32())}))


def main() -> int:
    with tempfile.TemporaryDirectory(prefix="graft-gate-neg-") as outdir:
        build_dump(outdir)
        proc = subprocess.run(
            [sys.executable, CHECKER, SF, outdir,
             "q_fixture_ok", "q_fixture_decimal", "q_fixture_drift"],
            capture_output=True, text=True)
        out = proc.stdout
        failures = []

        def expect(cond: bool, msg: str) -> None:
            if not cond:
                failures.append(msg)

        expect(proc.returncode == 1,
               f"gate must exit 1 on a red dump (got {proc.returncode})")
        expect("  OK   q_fixture_ok" in out,
               "clean control must stay OK")
        expect("FAIL q_fixture_decimal" in out,
               "decimal output column must FAIL")
        expect("DECIMAL in output schema" in out,
               "decimal failure must cite the no-DECIMAL invariant")
        expect("FAIL q_fixture_drift" in out,
               "type-drifted column must FAIL")
        expect("type drift" in out,
               "drift failure must cite the type-drift check")
        expect("== 1 ok, 2 fail ==" in out,
               f"expected 1 ok / 2 fail, got: {out.splitlines()[-1:]}")

        if failures:
            print("GATE NEGATIVE FIXTURE: FAIL")
            for m in failures:
                print(f"  - {m}")
            print("--- checker stdout ---")
            print(out)
            print("--- checker stderr ---")
            print(proc.stderr)
            return 1
        print("GATE NEGATIVE FIXTURE: ok "
              "(decimal + type-drift raise paths both fire; control passes)")
        return 0


if __name__ == "__main__":
    sys.exit(main())
