"""Pure-Python reference simulator for crawl-order equivalence (§5.4).

Implements the *documented semantics* of the reference crawler
(SURVEY.md §5.2 behaviors — ascending-cost pop with deterministic
tie-break, politeness measured from completion, first-parent link
dedup, robots OBEY/INVERT/IGNORE, cost rules + gate) with plain Python
data structures and the same deterministic clock as the Spark engine.

The equivalence test runs BOTH engines on the same (seeds, policy,
politeness budget, synthetic web) and asserts:
(a) identical fetch order (the sequence-ordered URL list), and
(b) identical final URL-seen set.

This is intentionally NOT derived from the reference implementation —
it is the executable form of the behaviors pinned in SURVEY.md, small
enough to audit by eye.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .functions.urls import canonicalize_url, url_hash, url_host
from .policy import (
    DOES_NOT_MATCH,
    IGNORE,
    INVERT,
    MATCHES,
    Policy,
    expand_seed_domains,
    make_mime_should_save,
)
from .sources.synthetic_web import WebConfig, fetch_one, session_token

_SCHEME_RE = re.compile(r"^https?://")


@dataclass
class SimResult:
    fetch_order: list[str] = field(default_factory=list)
    seen: set[bytes] = field(default_factory=set)
    batches: int = 0
    clock: float = 0.0
    results: list[dict] = field(default_factory=list)


def _sim_robots_rules(n_hosts: int, seed: int):
    # mirror of robots.synthetic_robots_rules (kept in sync by test)
    import zlib

    rules = []
    for i in range(n_hosts):
        hv = zlib.crc32(f"robots|{i}|{seed}".encode())
        host = f"h{i}.example"
        if i % 3 == 2:
            rules.append((host, "*", "/p1", False, None))
        if i % 5 == 4:
            rules.append((host, "*", "/", True, float(1 + hv % 3)))
    return rules


def _robots_allowed(rules, policy: Policy, host: str, url: str) -> bool:
    if policy.robots.usage == IGNORE:
        return True
    m = re.match(r"^https?://[^/]+(/.*)$", url)
    path = m.group(1) if (m and m.group(1)) else "/"
    agent = policy.agents()[0].lower()
    host_rules = [r for r in rules if r[0] == host]
    # group selection: a specific-UA group REPLACES '*' (robots.py)
    group = [r for r in host_rules if r[1].lower() == agent]
    if not group:
        group = [r for r in host_rules if r[1] == "*"]
    matching = [r for r in group if path.startswith(r[2])]
    if matching:
        matching.sort(key=lambda r: (-len(r[2]), not r[3]))
        allowed = bool(matching[0][3])
    else:
        allowed = True  # no rules / none match → decision is 'allowed'
    # INVERT negates the DECISION unconditionally (reference
    # robots.py:90-92) — so under INVERT a permissive host is dropped
    return (not allowed) if policy.robots.usage == INVERT else allowed


def _crawl_delays(rules) -> dict[str, float]:
    out: dict[str, float] = {}
    for host, _ua, _p, _a, cd in rules:
        if cd is not None:
            out[host] = max(out.get(host, 0.0), cd)
    return out


def _apply_cost(policy: Policy, seed_domains: list[str], url: str,
                parent_cost: float) -> float:
    for rule in policy.url_rules:
        if rule.pattern is None:
            matched = True
        else:
            pat = expand_seed_domains(rule.pattern, seed_domains)
            hit = re.search(pat, url) is not None
            matched = hit if rule.match == MATCHES else (not hit)
            if rule.match not in (MATCHES, DOES_NOT_MATCH):
                raise ValueError(rule.match)
        if matched:
            if rule.action == "ADD":
                return parent_cost + rule.amount
            return parent_cost * rule.amount
    return parent_cost


def simulate_crawl(
    seeds: list[str],
    policy: Policy,
    web: WebConfig,
    budget: int = 10,
    per_host_k: int = 1,
    global_delay: float = 5.0,
    rate_limits: dict[str, float] | None = None,
    max_batches: int | None = None,
    domain_logins: list[str] | None = None,
    job_id: str = "job",
) -> SimResult:
    strip = (policy.normalization.strip_parameters
             if policy.normalization.enabled else ())
    mime_allow = make_mime_should_save(policy)
    rate_limits = rate_limits or {}
    login_hosts = set(domain_logins or [])
    sessions: dict[str, str] = {}
    robots = _sim_robots_rules(web.n_hosts, web.seed)
    cds = _crawl_delays(robots) if policy.robots.obey_crawl_delay else {}

    def canon(u: str) -> str:
        return canonicalize_url(u, strip)

    def tb(u: str) -> str:
        return url_hash(u).hex()

    # frontier: url → (cost, host); seen: hashes of all ever-enqueued
    frontier: dict[str, tuple[float, str]] = {}
    seen: set[bytes] = set()
    seed_domains: list[str] = []
    for s in seeds:
        cu = canon(s)
        h = url_host(cu)
        seed_domains.append(h)
        frontier[cu] = (0.0, h)
        seen.add(url_hash(cu))
    if policy.robots.read_sitemaps:
        # mirror crawl._with_sitemap_seeds: seed hosts' robots Sitemap:
        # URLs join the frontier at cost 0 (seeds are not robots-gated)
        from .robots import robots_sitemaps, synthetic_robots_txt

        for s in seeds:
            hm = re.match(r"^https?://h(\d+)\.example", s)
            if not hm:
                continue
            for sm in robots_sitemaps(
                synthetic_robots_txt(int(hm.group(1)), web.seed)
            ):
                cu = canon(sm)
                if url_hash(cu) in seen:
                    continue
                frontier[cu] = (0.0, url_host(cu))
                seen.add(url_hash(cu))
    seed_domains = sorted(set(seed_domains))

    next_allowed: dict[str, float] = {}
    clock = 0.0
    out = SimResult(seen=seen)
    max_cost = policy.limits.max_cost

    while frontier:
        if max_batches is not None and out.batches >= max_batches:
            break
        eligible = {
            h for _, (c, h) in frontier.items()
            if next_allowed.get(h, float("-inf")) <= clock
        }
        if not eligible:
            pending_hosts = {h for _, h in frontier.values()}
            clock = min(next_allowed[h] for h in pending_hosts
                        if h in next_allowed)
            out.batches += 1
            continue
        # per-host k cheapest, then global budget — both by (cost, tie)
        by_host: dict[str, list[tuple[float, str, str]]] = {}
        for u, (c, h) in frontier.items():
            if h in eligible:
                by_host.setdefault(h, []).append((c, tb(u), u))
        survivors = []
        for h, items in by_host.items():
            items.sort()
            survivors.extend(items[:per_host_k])
        survivors.sort()
        popped = survivors[:budget]

        # login flow: one session per credentialed host per job,
        # established before its first fetch (login.py semantics)
        for _, _, u in popped:
            h = url_host(u)
            if h in login_hosts and h not in sessions:
                sessions[h] = session_token(job_id, h)

        # fetch all concurrently at `clock`
        batch_results = []
        for c, t, u in popped:
            r = fetch_one(web, u, sessions.get(url_host(u)),
                          mime_allow=mime_allow)
            completion = clock + r["latency_ms"] / 1000.0
            batch_results.append((c, t, u, r, completion))
            del frontier[u]

        # sequence order within batch = (cost, tie)
        batch_results.sort(key=lambda x: (x[0], x[1]))
        batch_new: set[str] = set()
        clock_end = clock
        host_completion: dict[str, float] = {}
        for c, t, u, r, completion in batch_results:
            if r.get("mime_blocked"):
                # reference MimeNotAllowedError: the download aborted —
                # never recorded, no links — but the rate limiter still
                # resets and wall time passed (downloader.py:243-245)
                clock_end = max(clock_end, completion)
                h = url_host(u)
                host_completion[h] = max(host_completion.get(h, 0.0),
                                         completion)
                continue
            out.fetch_order.append(u)
            out.results.append({
                "url": u, "cost": c, "status_code": r["status_code"],
                "image_id": r["image_id"], "caption": r["caption"],
                "completed_at": completion,
                "authenticated": r["authenticated"],
                "session_token": r["session_token"],
                # per-request agent rotation mirror (policy.agent_for)
                "user_agent": policy.agent_for(u),
            })
            clock_end = max(clock_end, completion)
            h = url_host(u)
            host_completion[h] = max(host_completion.get(h, 0.0), completion)
            for raw in r["links"]:
                if not _SCHEME_RE.match(raw):
                    continue
                cu = canon(raw)
                lh = url_host(cu)
                if not lh:
                    continue
                nc = _apply_cost(policy, seed_domains, cu, c)
                if nc <= 0 or (max_cost is not None and nc > max_cost):
                    continue
                if not _robots_allowed(robots, policy, lh, cu):
                    continue
                if cu in batch_new or url_hash(cu) in seen:
                    continue
                batch_new.add(cu)
                seen.add(url_hash(cu))
                frontier[cu] = (nc, lh)

        for h, comp in host_completion.items():
            # precedence: per-host rate limit > robots crawl-delay
            # (when obeyed) > global default — matches politeness.py
            if h in rate_limits:
                delay = rate_limits[h]
            elif h in cds:
                delay = cds[h]
            else:
                delay = global_delay
            next_allowed[h] = max(next_allowed.get(h, 0.0), comp + delay)

        clock = clock_end
        out.batches += 1

    out.clock = clock
    return out
