"""CAPTCHA-solver plumbing (reference captcha.py:1-147 command shape,
db.py:325-337 policy→solver join, login-flow usage)."""

import base64

import pytest

from starbelly_spark.captcha import (
    ALPHA_ONLY,
    NUMERIC_ONLY,
    CaptchaSolver,
    resolve_captcha_solver,
    solver_lookup,
)

DOC = {
    "id": "solver-1",
    "name": "anti",
    "service_url": "https://solver.invalid/api",
    "api_key": "k",
    "require_phrase": False,
    "case_sensitive": True,
    "characters": "ALPHANUMERIC",
    "require_math": False,
    "min_length": 4,
    "max_length": 8,
}


def test_get_command_shape():
    s = CaptchaSolver.from_doc(DOC)
    cmd = s.get_command(b"\x89PNGdata")
    assert cmd["clientKey"] == "k"
    t = cmd["task"]
    assert t["type"] == "ImageToTextTask"
    assert base64.b64decode(t["body"]) == b"\x89PNGdata"
    assert (t["phrase"], t["case"], t["numeric"], t["math"]) == \
        (False, True, 0, False)
    assert (t["minLength"], t["maxLength"]) == (4, 8)


def test_numeric_encoding_and_invalid():
    s = CaptchaSolver.from_doc({**DOC, "characters": "NUMERIC_ONLY"})
    assert s.get_command(b"x")["task"]["numeric"] == 1
    s = CaptchaSolver.from_doc({**DOC, "characters": "ALPHA_ONLY"})
    assert s.get_command(b"x")["task"]["numeric"] == 2
    s = CaptchaSolver.from_doc({**DOC, "characters": "BOGUS"})
    with pytest.raises(ValueError):
        s.get_command(b"x")


def test_solve_deterministic_respects_settings():
    s = CaptchaSolver.from_doc({**DOC, "characters": NUMERIC_ONLY})
    a, b = s.solve_deterministic(b"img1"), s.solve_deterministic(b"img1")
    assert a == b and a.isdigit() and 4 <= len(a) <= 8
    s2 = CaptchaSolver.from_doc({**DOC, "characters": ALPHA_ONLY,
                                 "max_length": 0})
    assert s2.solve_deterministic(b"img1").isalpha()


def test_resolve_policy_join():
    pol = {"captcha_solver_id": "solver-1", "limits": {}}
    out = resolve_captcha_solver(pol, {"solver-1": DOC})
    assert out["captcha_solver"]["name"] == "anti"
    assert "captcha_solver_id" not in out
    assert resolve_captcha_solver({"limits": {}}, {}) == {"limits": {}}


def test_solver_lookup_broadcast_join(spark):
    jobs = spark.createDataFrame(
        [("j1", "solver-1"), ("j2", None)],
        "job_id string, captcha_solver_id string",
    )
    solvers = spark.createDataFrame(
        [("solver-1", "anti")], "solver_id string, name string"
    )
    out = {r.job_id: r.name for r in solver_lookup(jobs, solvers).collect()}
    assert out == {"j1": "anti", "j2": None}
    plan = solver_lookup(jobs, solvers)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_login_flow_counts_captchas(spark, tmp_path):
    from starbelly_spark.crawl import CrawlSettings, run_crawl, start_job
    from starbelly_spark.policy import Limits, Policy, UrlRule
    from starbelly_spark.sources.synthetic_web import WebConfig

    web = WebConfig(n_hosts=3, total_pages=18, branching=2, seed=42)
    policy = Policy(url_rules=(UrlRule("ADD", 1.0),),
                    limits=Limits(max_cost=3.0),
                    captcha_solver_id="solver-1")
    settings = CrawlSettings(budget=6, per_host_k=1, global_delay=0.5,
                             seen_partitions=4, bloom_bits=1 << 13,
                             cuckoo_buckets=1 << 8)
    root = str(tmp_path / "cap")
    start_job(spark, root, "jc", web.seeds(2), policy, web, settings,
              domain_logins=[("h1.example", "u", "p")],
              captcha_solvers=[DOC])
    m = run_crawl(spark, root, "jc", max_batches=20)
    assert m["counters"].get("captcha_solved") == 1   # one login, one solve
    assert "h1.example" in m["sessions"]
