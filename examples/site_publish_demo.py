"""Publish walkthrough: transform results -> chart widgets -> Plotly
figure payloads -> static HTML site -> git deploy, end to end and fully
offline (the deploy target is a local ``file://`` bare repository, which
runs the exact staging-branch flow a real GitHub remote would).

  1. aggregate the star schema into per-region widget frames
  2. shape them with the widget data ops (sort/limit/percent)
  3. build the Plotly figure dicts (reference layout defaults + palette)
  4. export the HTML site (figures embedded as application/json blocks)
  5. deploy_github the tree to a bare repo; redeploy shows the
     no-change lane; a changed site pushes a new commit

Run:  python examples/site_publish_demo.py [sf_dir] [work_dir]
Defaults: /root/testdata/sf0.001  /tmp/niamoto_site_demo
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/niamoto_site_demo"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    from niamoto_spark.deployers import deploy_github
    from niamoto_spark.exporters.html_site import export_html_site
    from niamoto_spark.exporters.plotly_figures import (bar_figure_from,
                                                        donut_figure_from)
    from niamoto_spark.session import get_spark
    from niamoto_spark.widgets import bar_plot_data, donut_chart_data

    spark = get_spark("site_demo")
    t = lambda name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))  # noqa: E731

    # 1. per-region revenue + order-priority mix
    rev = (t("orders")
           .join(t("customer"),
                 F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(t("nation")),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(t("region")),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .groupBy("r_name")
           .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                F.count(F.lit(1)).alias("n_orders")))
    prio = (t("orders").groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n")))

    # 2-3. widget shaping -> figure dicts
    bar = bar_figure_from(bar_plot_data(rev, "r_name", "revenue"),
                          title="Revenue by region")
    donut = donut_figure_from(donut_chart_data(prio, "o_orderpriority", "n"),
                              title="Order priority mix")
    print(f"bar figure: {len(bar['data'][0]['x'])} regions, "
          f"colorway {bar['layout']['colorway'][0]}")

    # 4. one results row per region, figure payloads as widget columns
    results = (rev.withColumn("revenue_chart", F.lit(json.dumps(bar)))
               .withColumn("priority_chart", F.lit(json.dumps(donut))))
    site_dir = os.path.join(work, "site")
    manifest = export_html_site(results, "r_name", site_dir,
                                group_name="regions",
                                site_name="Niamoto demo")
    print(f"exported {manifest['entities']} region pages -> {site_dir}")

    # 5. deploy to a local bare repo (identical flow to a real remote)
    bare = os.path.join(work, "pages.git")
    subprocess.run(["git", "init", "-q", "--bare", bare], check=True)
    r1 = deploy_github(site_dir, f"file://{bare}", project_name="demo")
    print(f"deployed: commit {r1['commit']} ({r1['files']} files)")
    r2 = deploy_github(site_dir, f"file://{bare}", project_name="demo")
    print(f"redeploy unchanged: pushed={r2['pushed']} (no-change lane)")
    with open(os.path.join(site_dir, "index.html"), "a") as f:
        f.write("<!-- v2 -->")
    r3 = deploy_github(site_dir, f"file://{bare}", project_name="demo")
    print(f"changed site: new commit {r3['commit']} "
          f"(was {r1['commit']})")
    tree = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", "gh-pages"],
        cwd=bare, capture_output=True, text=True).stdout.split()
    assert "index.html" in tree and ".nojekyll" in tree
    print(f"remote gh-pages tree: {len(tree)} files — OK")


if __name__ == "__main__":
    main()
