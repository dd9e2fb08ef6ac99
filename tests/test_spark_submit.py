"""End-to-end spark-submit deployment test.

The north rule says the job "runs via spark-submit --py-files on a
multi-executor cluster". This test exercises that exact deployment shape on
the only cluster manager available in the sandbox (local[k]):

  1. package the library with ``tools/make_pyfiles.py`` → zip,
  2. ``spark-submit --master local[4] --py-files <zip> jobs/crawl_job.py``
     against a scripted fixture site written to parquet,
  3. assert the JSON sink rows and the reference's pass/fail exit-code
     semantics (src/cli.ts:446,578,589: 0 iff no broken links).

The subprocess runs with a *clean* cwd (no repo on sys.path) so any import
that works does so only through the --py-files archive — the same proof a
real cluster would give.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                            "spark-submit")


def _write_fixture(spark, tmpdir: str) -> tuple[str, str]:
    from linkinator_spark.sources.fixtures import SiteBuilder

    site = SiteBuilder()
    site.page("http://fake.local/",
              html='<a href="/ok.html">ok</a><a href="/gone.html">gone</a>')
    site.page("http://fake.local/ok.html", html="<p>fine</p>")
    site.page("http://fake.local/gone.html", html="", status=404)
    pages, docs = site.build(spark)
    pages_path = os.path.join(tmpdir, "pages.parquet")
    docs_path = os.path.join(tmpdir, "docs.parquet")
    pages.write.mode("overwrite").parquet(pages_path)
    docs.write.mode("overwrite").parquet(docs_path)
    return pages_path, docs_path


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit launcher not present")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    tmpdir = str(tmp_path)
    pages_path, docs_path = _write_fixture(spark, tmpdir)

    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         os.path.join(tmpdir, "linkinator_spark.zip")],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    assert os.path.exists(zip_path)

    # the job script must travel like a user artifact, not be found via cwd
    job = os.path.join(tmpdir, "crawl_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "crawl_job.py"), job)
    out_dir = os.path.join(tmpdir, "out")

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "SPARK_MASTER", "SPARK_GRAFT_CPUS")}
    env["SPARK_DRIVER_MEMORY"] = "2g"
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path, job,
         "http://fake.local/",
         "--pages", pages_path, "--documents", docs_path,
         "--recurse", "--format", "json", "--output", out_dir],
        cwd=tmpdir, env=env, capture_output=True, text=True, timeout=420,
    )
    # one broken link → exit code 1 (reference pass/fail semantics)
    assert proc.returncode == 1, proc.stderr[-4000:]

    rows = []
    for part in glob.glob(os.path.join(out_dir, "part-*.json")):
        with open(part) as f:
            rows.extend(json.loads(line) for line in f if line.strip())
    by_url = {r["url"]: r for r in rows}
    assert by_url["http://fake.local/gone.html"]["state"] == "BROKEN"
    assert by_url["http://fake.local/gone.html"]["status"] == 404
    assert by_url["http://fake.local/ok.html"]["state"] == "OK"
    assert by_url["http://fake.local/"]["state"] == "OK"
