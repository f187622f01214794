"""--py-files packaging: the zip built by tools/package_pyfiles.py must be
the engine's complete import surface (north rule: run via spark-submit
--py-files on a multi-executor cluster — executors re-import every module a
pandas-UDF closure references from the shipped archive, so a module missing
from the zip or one that assumes a real directory breaks only at task time
on a real cluster)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _run_from_zip(zip_path, code, tmp_path, timeout):
    """Run `code` in a subprocess whose ONLY s_crawler_spark import path is
    the zip (cwd moved off the repo so the source tree can't shadow it).
    PREPEND to PYTHONPATH — Spark-distribution setups provide pyspark/py4j
    through it, and clobbering them would fail on pyspark, not the zip."""
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=(
        zip_path + os.pathsep + existing if existing else zip_path))
    return subprocess.run(
        [sys.executable, "-c", code], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=timeout)


def test_zip_is_deterministic_and_importable(tmp_path):
    from package_pyfiles import build

    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read()      # re-pack is byte-identical

    # every module of the package imports from the zip alone — pin the
    # ZIP PATH into __file__ (a path-prefix check against __path__[0] is
    # tautological for any import source, including a source-tree fallback)
    code = (
        "import pkgutil, importlib, s_crawler_spark\n"
        f"assert {z1!r} in s_crawler_spark.__file__, s_crawler_spark.__file__\n"
        "mods = [m.name for m in pkgutil.walk_packages("
        "s_crawler_spark.__path__, 's_crawler_spark.')]\n"
        "assert len(mods) > 15, mods\n"
        "[importlib.import_module(m) for m in mods]\n"
        "print('IMPORTED', len(mods))\n"
    )
    res = _run_from_zip(z1, code, tmp_path, timeout=120)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "IMPORTED" in res.stdout


def test_pandas_udf_path_executes_from_zip(tmp_path):
    """A pandas-UDF-bearing plan (candidate extraction) runs with the
    package imported from the zip — the exact dependency --py-files
    deployment exercises: Python workers re-import the UDF's module via
    zipimport when they unpickle the closure."""
    from package_pyfiles import build

    z = build(str(tmp_path / "pkg.zip"))
    code = (
        "from s_crawler_spark.session import get_spark\n"
        "from s_crawler_spark.corpus import synthesize_pages, "
        "seed_search_url\n"
        "from s_crawler_spark.plans import wave as wv\n"
        "spark = get_spark('pyfiles-smoke', master='local[2]', "
        "shuffle_partitions=2)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "pages = synthesize_pages(spark, '/root/testdata/sf0.001')\n"
        "n = wv.collect_candidates(pages, seed_search_url()).count()\n"
        "print('CANDIDATES', n)\n"
        "assert n > 0\n"
    )
    res = _run_from_zip(z, code, tmp_path, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "CANDIDATES" in res.stdout
