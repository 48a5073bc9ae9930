"""Domain-login flow semantics (reference ``starbelly/login.py``):
one login per credentialed domain per job, established BEFORE that
domain's first fetch; the per-job session (cookie-jar analogue) is
consumed by the fetch kernel; mirrored by the simulator."""

from pyspark.sql import functions as F

from starbelly_spark.crawl import CrawlSettings, run_crawl, start_job
from starbelly_spark.policy import Limits, Policy, UrlRule
from starbelly_spark.simulator import simulate_crawl
from starbelly_spark.sources.synthetic_web import WebConfig, session_token
from starbelly_spark.tableio import JobStore

WEB = WebConfig(n_hosts=4, total_pages=40, branching=2, seed=42)
POLICY = Policy(url_rules=(UrlRule("ADD", 1.0),), limits=Limits(max_cost=4.0))
SETTINGS = CrawlSettings(budget=6, per_host_k=1, global_delay=1.0,
                         compact_every=4, seen_partitions=4,
                         bloom_bits=1 << 13, cuckoo_buckets=1 << 8)
LOGINS = [("h1.example", "user1", "hunter2")]


def test_login_sessions_and_equivalence(spark, tmp_path):
    root = str(tmp_path / "lg")
    start_job(spark, root, "jobL", WEB.seeds(2), POLICY, WEB, SETTINGS,
              domain_logins=LOGINS)
    m = run_crawl(spark, root, "jobL", max_batches=200)
    assert m["run_state"] == "completed"

    # exactly one session per credentialed host, deterministic token
    assert m["sessions"] == {
        "h1.example": session_token("jobL", "h1.example")
    }

    store = JobStore(spark, root, "jobL")
    res = store.table(m, "results")
    rows = res.select("url", "authenticated", "session_token").collect()
    assert rows
    for r in rows:
        if r.url.startswith("http://h1.example/"):
            assert r.authenticated
            assert r.session_token == m["sessions"]["h1.example"]
        else:
            assert not r.authenticated and r.session_token is None
    # credentialed host actually got fetched (the flow triggered)
    assert any(r.url.startswith("http://h1.example/") for r in rows)

    # simulator equivalence including the authenticated flags
    sim = simulate_crawl(
        WEB.seeds(2), POLICY, WEB,
        budget=SETTINGS.budget, per_host_k=SETTINGS.per_host_k,
        global_delay=SETTINGS.global_delay,
        domain_logins=[h for h, _, _ in LOGINS], job_id="jobL",
    )
    got = [(r.url, r.authenticated, r.session_token)
           for r in res.orderBy("sequence").collect()]
    want = [(r["url"], r["authenticated"], r["session_token"])
            for r in sim.results]
    assert got == want


def test_no_logins_all_unauthenticated(spark, tmp_path):
    root = str(tmp_path / "nl")
    start_job(spark, root, "jobN", WEB.seeds(1), POLICY, WEB, SETTINGS)
    m = run_crawl(spark, root, "jobN", max_batches=5)
    store = JobStore(spark, root, "jobN")
    res = store.table(m, "results")
    assert res.where(F.col("authenticated")).count() == 0
    assert m.get("sessions") == {}


# ---- r3: login-form classification (reference login.py:39-90,185-233) -----

def test_multi_form_page_picks_login_form():
    from starbelly_spark.login import (
        build_login_request,
        classify_forms,
        select_login_fields,
        select_login_form,
    )
    from starbelly_spark.sources.synthetic_web import login_page

    html = login_page(WEB, "h1.example")
    forms = classify_forms(html)
    assert len(forms) == 3
    form, meta = select_login_form(forms)
    assert form["action"] == "/login" and form["method"] == "POST"
    u, p, c = select_login_fields(meta["fields"])
    assert (u, p, c) == ("username", "password", None)

    action, method, fields = build_login_request(
        "http://h1.example/login", html, "user1", "hunter2")
    assert action == "http://h1.example/login"
    assert method == "POST"
    assert fields["username"] == "user1"
    assert fields["password"] == "hunter2"
    assert fields["csrf"] == "tok-h1.example"   # untouched prefill kept


def test_login_form_with_captcha_needs_solver():
    import pytest

    from starbelly_spark.captcha import CaptchaSolver
    from starbelly_spark.login import build_login_request
    from starbelly_spark.sources.synthetic_web import login_page

    html = login_page(WEB, "h2.example", with_captcha=True)
    with pytest.raises(ValueError, match="CAPTCHA required"):
        build_login_request("http://h2.example/login", html, "u", "p")
    solver = CaptchaSolver.from_doc(
        {"id": "s1", "name": "s1", "service_url": "http://solver.example",
         "api_key": "k", "min_length": 4, "max_length": 4})
    action, method, fields = build_login_request(
        "http://h2.example/login", html, "u", "p", solver=solver)
    assert fields["captcha_answer"]                 # solved, substituted
    assert action == "http://h2.example/login"


def test_no_login_form_raises():
    import pytest

    from starbelly_spark.login import build_login_request

    # no forms at all → the reference's "Can't find login form"
    with pytest.raises(ValueError, match="Can't find login form"):
        build_login_request("http://x/login", "<html><body/></html>",
                            "u", "p")
    # a search-only page: like the reference, the argmax still picks
    # SOME form (every form has a login probability) and the failure
    # surfaces at field selection — login.py:214-215 semantics
    html = ('<html><body><form action="/search" method="GET">'
            '<input type="text" name="q"></form></body></html>')
    with pytest.raises(ValueError, match="username/password"):
        build_login_request("http://x/login", html, "u", "p")


def test_multi_user_login_deterministic_pick(spark, tmp_path):
    """r4 (reference db.py:477-487 / login.py:116-127): a domain may
    carry SEVERAL users; the reference picks one per attempt with
    random.choice, we pick deterministically (crc32(job|host) over the
    username-sorted list) so crawl ordering stays reproducible."""
    from starbelly_spark.crawl import _pick_login_user

    users = [("bob", "pw2"), ("alice", "pw1"), ("carol", "pw3")]
    picked = _pick_login_user(users, "jobM", "h1.example")
    # pure function: repeated calls and list order don't change the pick
    assert picked == _pick_login_user(list(reversed(users)), "jobM",
                                      "h1.example")
    assert picked in users
    # different job/host may pick differently but always deterministically
    import zlib

    i = zlib.crc32(b"jobM|h1.example") % 3
    assert picked == sorted(users)[i]

    root = str(tmp_path / "mu")
    start_job(spark, root, "jobM", WEB.seeds(2), POLICY, WEB, SETTINGS,
              domain_logins=[("h1.example", u, p) for u, p in users])
    m = run_crawl(spark, root, "jobM", max_batches=6)
    # one session per credentialed DOMAIN (not per user), same token
    # shape as the single-user flow
    assert m["sessions"] == {
        "h1.example": session_token("jobM", "h1.example")
    }
    assert "login_failed" not in m["counters"]


def test_login_failure_continues_unauthenticated(spark, tmp_path, monkeypatch):
    """r4 (advisor): a login-form classification failure must NOT abort
    the batch — the reference logs and crawls the host unauthenticated
    (login.py:141-145)."""
    import starbelly_spark.login as login_mod

    def _boom(*a, **k):
        raise ValueError("Can't find login form")

    monkeypatch.setattr(login_mod, "build_login_request", _boom)
    root = str(tmp_path / "lf")
    start_job(spark, root, "jobF", WEB.seeds(2), POLICY, WEB, SETTINGS,
              domain_logins=LOGINS)
    m = run_crawl(spark, root, "jobF", max_batches=200)
    assert m["run_state"] == "completed"          # crawl did not abort
    assert m["sessions"] == {}                    # no session established
    assert m["counters"]["login_failed"] >= 1
    store = JobStore(spark, root, "jobF")
    res = store.table(m, "results")
    h1 = res.where(F.col("url").startswith("http://h1.example/"))
    assert h1.count() > 0                         # host still crawled
    assert h1.where(F.col("authenticated")).count() == 0


def test_login_form_beats_lookalike_without_password():
    """A form whose ACTION says login but has no password field must
    lose to the real login form (the classifier scores, not the URL)."""
    from starbelly_spark.login import classify_forms, select_login_form

    html = """<html><body>
<form action="/login-help" method="POST">
  <input type="text" name="email">
</form>
<form action="/auth" method="POST">
  <input type="text" name="user_name">
  <input type="password" name="pass">
</form>
</body></html>"""
    form, meta = select_login_form(classify_forms(html))
    assert form["action"] == "/auth"
