"""CLI parity (JASS_index / JASS_anytime / JASS_eval): the reference's
file-in/file-out workflow, end-to-end on the ten-document corpus."""

import os

from jassv2_spark.cli import jass_anytime_main, jass_eval_main, jass_index_main
from jassv2_spark.fixtures import ten_documents


def test_cli_index_anytime_eval_roundtrip(spark, tmp_path, capsys):
    # --- jass index -f docs.trec -o ix ---------------------------------
    trec = tmp_path / "docs.trec"
    trec.write_bytes(b"".join(r["html"] for r in ten_documents()))
    ix = str(tmp_path / "ix")
    assert jass_index_main(["-f", str(trec), "-o", ix]) == 0
    assert os.path.exists(os.path.join(ix, "stats.json"))

    # --- jass anytime -i ix -q queries.txt -k 3 ------------------------
    qfile = tmp_path / "queries.txt"
    qfile.write_text("q1 one\nq2 ten ten nine\nq3 zzz\n")
    run = str(tmp_path / "ranking.txt")
    assert jass_anytime_main(["-i", ix, "-q", str(qfile), "-k", "3", "-o", run]) == 0
    lines = [l.split() for l in open(run) if l.strip()]
    assert all(len(l) == 6 and l[1] == "Q0" for l in lines)
    by_q = {}
    for l in lines:
        by_q.setdefault(l[0], []).append(l[2])
    assert by_q["q1"] == ["10"]  # 'one' only in doc 10
    assert len(by_q["q2"]) == 3 and "q3" not in by_q  # OOV → no rows

    # raw parser flag: pre-normalized queries give the same run
    run_a = str(tmp_path / "ranking_a.txt")
    assert jass_anytime_main(["-i", ix, "-q", str(qfile), "-k", "3", "-a", "-o", run_a]) == 0
    assert open(run_a).read() == open(run).read()

    # --- jass eval -a qrels -r run -p ----------------------------------
    qrels = tmp_path / "qrels.txt"
    qrels.write_text("q1 0 10 1\nq2 0 10 1\nq2 0 9 1\nq2 0 1 1\n")
    assert jass_eval_main(["-a", str(qrels), "-r", run, "-p"]) == 0
    out = capsys.readouterr().out
    rows = {
        tuple(l.split("\t")[:2]): l.split("\t")[2]
        for l in out.splitlines()
        if l.count("\t") == 2
    }
    assert float(rows[("mrr", "q1")]) == 1.0  # doc 10 at rank 1
    assert ("mean_map", "all") in rows

    # price extension routes to the eCommerce metric family
    qrels_p = tmp_path / "qrels_price.txt"
    qrels_p.write_text(
        "PRICE 0 10 5.0\nPRICE 0 9 2.0\nPRICE 0 1 4.0\n"
        + "".join(f"PRICE 0 {d} 1.0\n" for d in range(2, 9))
        + "q1 0 10 1\nq2 0 10 1\nq2 0 9 1\n"
    )
    assert jass_eval_main(["-a", str(qrels_p), "-r", run]) == 0
    out_p = capsys.readouterr().out
    assert any("mean_buying_power" in l for l in out_p.splitlines())


def test_cli_curate(tmp_path, capsys):
    import subprocess, sys
    out = str(tmp_path / "survivors")
    r = subprocess.run(
        [sys.executable, "-m", "jassv2_spark.cli", "curate",
         "-f", "/root/testdata/sf0.001/documents.parquet", "-o", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.split() and l.split()[0] in
             ("lang", "quality", "near_dup")]
    assert len(lines) == 3
    assert "survivors written" in r.stdout
    import duckdb
    n_out = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    final = int(lines[-1].rsplit("out=", 1)[1])
    assert n_out == final > 0
