"""North-rule packaging check: the index build must run via
`spark-submit --py-files <zip>` on a multi-executor cluster.  This test
actually does it — package the library into a zip, submit
scripts/submit_build.py to a 2-executor local-cluster (separate executor
JVMs with their own Python workers importing the package FROM THE ZIP),
and require the produced index to answer queries identically (by docno +
rounded score; tie order is docid-space-dependent) to an in-process build
over the same corpus.

Caught real breakage once already: package data loaded via __file__
paths (stop_words.txt) does not exist inside a zipimport."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"
QUERIES = [(1, "sym1 sym2"), (2, "int return"), (3, "twinkle wonder"),
           (5, "fn_100 static const")]


def _zip_package(dest: str) -> None:
    pkg = os.path.join(REPO, "searchenginepp_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(not os.path.exists(DOCS), reason="testdata absent")
def test_spark_submit_pyfiles_local_cluster(spark, tmp_path):
    import pyspark

    spark_home = os.path.dirname(pyspark.__file__)
    submit = os.path.join(spark_home, "bin", "spark-submit")
    if not os.path.exists(submit):
        pytest.skip("spark-submit launcher not available")

    zip_path = str(tmp_path / "sepp.zip")
    _zip_package(zip_path)
    out_idx = str(tmp_path / "submit_idx")
    env = dict(os.environ, SPARK_HOME=spark_home)
    proc = subprocess.run(
        [submit, "--master", "local-cluster[2,1,2048]",
         "--py-files", zip_path,
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.executor.memory=2g",
         os.path.join(REPO, "scripts", "submit_build.py"),
         "--input", DOCS, "--output", out_idx],
        capture_output=True, text=True, timeout=540, env=env, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-2000:]
    for part in ("index_shards", "docmap", "global_lexicon", "stats"):
        assert os.path.isdir(f"{out_idx}/{part}"), part

    # reference answers: the same build in-process over the same corpus
    from searchenginepp_spark.operators.index_build import build_index
    from searchenginepp_spark.operators.local_engine import LocalSearcher
    from searchenginepp_spark.operators.query import search
    from searchenginepp_spark.sources.corpus import load_corpus

    ref_idx = str(tmp_path / "ref_idx")
    build_index(spark, load_corpus(spark, DOCS), ref_idx)
    want = sorted((r["qid"], r["docno"], round(r["score"], 6))
                  for r in search(spark, ref_idx, QUERIES, k=10).collect())
    ls = LocalSearcher(out_idx)
    got = sorted((qid, docno, round(score, 6))
                 for qid, _d, docno, _r, score in ls.search(QUERIES, k=10))
    assert got == want
    shutil.rmtree(out_idx, ignore_errors=True)


def test_package_importable_from_zip(tmp_path):
    """Every package data file must load under zipimport (the --py-files
    environment) — guards the importlib.resources contract without paying
    a full spark-submit."""
    zip_path = str(tmp_path / "sepp.zip")
    _zip_package(zip_path)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from searchenginepp_spark.functions.stop_words import stop_words\n"
        "assert len(stop_words()) == 1155, len(stop_words())\n"
        "from searchenginepp_spark.functions.normalizer import term_frequencies\n"
        "assert term_frequencies('the quick fox the') == {'quick': 1, 'fox': 1}\n"
        "print('ok')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, zip_path],
        capture_output=True, text=True, timeout=120,
        cwd=str(tmp_path),
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"})
    assert proc.returncode == 0, proc.stderr[-1000:]
    assert proc.stdout.strip() == "ok"
