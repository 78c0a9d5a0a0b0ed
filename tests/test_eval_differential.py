"""Differential test: operators/evaluate.py vs the COMPILED `JASS_eval`.

The eval suite was ported from `tools/JASS_eval.cpp` (round 2) with
oracle-paired registry entries; this closes the loop against the living
binary: a deterministic run + binary qrels go through `JASS_eval -p` and
`evaluate_run`, and every metric whose definition provably aligns is
compared per query to 4 decimals (the binary prints %.4f):

- counts (Number Relevant / Returned), MRR, MAP (AP/n_rel), P@10,
  R@10 (generator keeps n_rel ≤ depth so our min(n_rel, depth)
  denominator equals the reference's n_rel), F1@10 (harmonic of the
  same two), ESL (queries with ≥1 relevant retrieved), MRR4K (-k 10),
  RBP (p = 0.95).

Skips when the toolchain is unavailable (same gate as the other
differential modules); the fixture builds JASS_eval on demand from the
cached libJASS.a.
"""

import os
import random
import re
import shutil
import subprocess

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
REFBUILD = os.path.abspath(os.path.join(TOOLS, "refbuild"))
JASS_EVAL = os.path.join(REFBUILD, "JASS_eval")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not os.path.isdir("/root/reference"),
    reason="reference toolchain unavailable",
)


@pytest.fixture(scope="session")
def jass_eval():
    if not os.path.isfile(JASS_EVAL):
        r = subprocess.run(["bash", os.path.join(TOOLS, "build_reference.sh")],
                           capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            pytest.skip(f"reference build failed: {r.stderr[-300:]}")
        r = subprocess.run(
            ["g++", "-std=c++17", "-O2", "-march=native", "-mbmi", "-mavx2",
             "-w", "-I/root/reference/source", f"-I{REFBUILD}/gen",
             "-o", JASS_EVAL, "/root/reference/tools/JASS_eval.cpp",
             os.path.join(REFBUILD, "libJASS.a"), "-lz", "-lpthread"],
            capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            pytest.skip(f"JASS_eval build failed: {r.stderr[-300:]}")
    return JASS_EVAL


def _gen(seed: int = 5, n_queries: int = 40, depth: int = 10):
    """Deterministic run + binary qrels: each query retrieves ≤ depth
    docs; 1-8 relevant docs per query (≤ depth so recall denominators
    align); some relevant docs unretrieved, some queries retrieve no
    relevant doc at all."""
    rng = random.Random(seed)
    run_rows, qrel_rows = [], []
    for q in range(1, n_queries + 1):
        qid = str(q)
        docs = [f"d{q}_{i}" for i in range(20)]
        rel = rng.sample(docs, rng.randint(1, 8))
        retrieved = rng.sample(docs, rng.randint(1, depth))
        if q % 7 == 0:  # force a query with zero relevant retrieved
            retrieved = [d for d in docs if d not in rel][:depth]
        for rank, d in enumerate(retrieved, start=1):
            run_rows.append((qid, d, rank, 1000 - rank))
        qrel_rows.extend((qid, d) for d in rel)
    return run_rows, qrel_rows


def _parse_per_query(text: str) -> dict[str, dict[str, float]]:
    """JASS_eval -p prints one block per query then an Averages block;
    key each block's metrics by the short name in parentheses."""
    out: dict[str, dict[str, float]] = {}
    current = None
    for line in text.splitlines():
        if line.startswith("QUERY ID"):
            current = line.split(":")[1].strip()
            out[current] = {}
            continue
        if current is None or ":" not in line:
            continue
        label, value = line.rsplit(":", 1)
        label = label.strip()
        m = re.search(r"\(([A-Za-z0-9@]+)\)$", label)
        key = m.group(1) if m else label
        try:
            out[current][key] = float(value.strip())
        except ValueError:
            pass
    return out


def test_evaluate_run_matches_live_JASS_eval(spark, jass_eval, tmp_path):
    from jassv2_spark.operators.evaluate import evaluate_run

    depth = 10
    run_rows, qrel_rows = _gen(depth=depth)
    run_file = tmp_path / "run.txt"
    run_file.write_text("".join(
        f"{q} Q0 {d} {rank} {rsv} runA\n" for q, d, rank, rsv in run_rows))
    qrel_file = tmp_path / "qrels.txt"
    qrel_file.write_text("".join(f"{q} 0 {d} 1\n" for q, d in qrel_rows))

    r = subprocess.run(
        [jass_eval, "-a", str(qrel_file), "-r", str(run_file), "-p",
         "-k", str(depth)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    ref = _parse_per_query(r.stdout)

    run_df = spark.createDataFrame(
        [(q, d, rank) for q, d, rank, _ in run_rows],
        "query_id string, doc_id string, rank long")
    qrels_df = spark.createDataFrame(qrel_rows, "query_id string, doc_id string")
    ours = {row["query_id"]: row
            for row in evaluate_run(run_df, qrels_df, depth=depth).collect()}

    assert set(ours) <= set(ref)
    compared = 0
    for qid, row in ours.items():
        want = ref[qid]
        assert row["n_rel"] == want["Number Relevant"], qid
        assert row["n_ret"] == want["Number of Results Returned"], qid
        for our_key, ref_key in [
            ("mrr", "MRR"), ("map", "MAP"), ("p_at_depth", "P@10"),
            ("recall", "R@10"), ("mrr4k", "MRR4K"),
        ]:
            assert row[our_key] == pytest.approx(want[ref_key], abs=5e-5), (
                qid, our_key, row[our_key], want[ref_key])
        # Living-binary BUG, found by this differential: JASS_eval's RBP
        # line is computed with the MAP computer (`tools/JASS_eval.cpp:836`
        # calls evaluate_map_computer.compute though an RBP computer was
        # constructed one line above), so the printed "RBP" equals MAP.
        # Assert the bug so a fixed upstream flips this test loudly; our
        # rbp follows the (correct) evaluate_rank_biased_precision class,
        # whose Moffat RBP(0.95)=0.1881 vector is covered in
        # tests/test_evaluate.py.
        assert want["RBP"] == pytest.approx(want["MAP"], abs=5e-5), qid
        if row["f1"] is not None:
            assert row["f1"] == pytest.approx(want["F1@10"], abs=5e-5), qid
        if row["n_rel"] and row["mrr"] > 0:  # ≥1 relevant retrieved
            assert row["esl"] == pytest.approx(want["ESL"], abs=5e-5), qid
        compared += 1
    assert compared == 40
