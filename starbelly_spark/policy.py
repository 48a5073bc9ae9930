"""Crawl policy engine as Spark column expressions (SURVEY.md §2.2/2.7).

Semantics matched from the reference (no code reuse):

* URL cost rules — first-match regex chain; ``match`` ∈ {MATCHES,
  DOES_NOT_MATCH}; ``action`` ADD (parent+amount) or MULTIPLY
  (parent×amount); terminal rule has no pattern.  Depth tracking is
  ADD 1.  (``/root/reference/starbelly/policy.py:748-771``, pinned by
  ``tests/test_policy.py:573-616``.)
* ``{SEED_DOMAINS}`` placeholder in patterns expands to an alternation
  of the job's seed domains at plan time
  (``starbelly/policy.py:705-721``).
* Cost gate — a link is pruned when ``new_cost <= 0`` or
  ``new_cost > max_cost`` (``starbelly/extractor.py:91-93``,
  ``starbelly/policy.py:276-283``).
* MIME save rules — first-match regex chain over content-type with a
  terminal default (``starbelly/policy.py:371-391``, pinned by
  ``tests/test_policy.py:314-351``).
* URL normalization config — enabled flag + strip-parameter list fed
  into the canonicalize UDF (``starbelly/policy.py:627-642``).
* robots usage OBEY / INVERT / IGNORE (``starbelly/policy.py:571-584``).

Everything compiles to ``when``/``otherwise`` chains of JVM-side
expressions — whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

MATCHES = "MATCHES"
DOES_NOT_MATCH = "DOES_NOT_MATCH"
ADD = "ADD"
MULTIPLY = "MULTIPLY"
OBEY = "OBEY"
INVERT = "INVERT"
IGNORE = "IGNORE"

SEED_DOMAINS_TOKEN = "{SEED_DOMAINS}"


@dataclass(frozen=True)
class UrlRule:
    action: str                      # ADD | MULTIPLY
    amount: float
    pattern: str | None = None       # None → terminal (always applies)
    match: str = MATCHES


@dataclass(frozen=True)
class MimeRule:
    save: bool
    pattern: str | None = None       # None → terminal
    match: str = MATCHES


PROXY_SCHEMES = ("http", "https", "socks4", "socks4a", "socks5")


@dataclass(frozen=True)
class ProxyRule:
    """One proxy-routing rule (``starbelly/policy.py:394-521``,
    pinned by ``tests/test_policy.py:412-453``): non-terminal rules
    require pattern + match + proxy_url; the terminal rule may carry
    only an (optional) proxy_url."""
    proxy_url: str | None = None
    pattern: str | None = None       # None → terminal
    match: str = MATCHES

    @property
    def proxy_type(self) -> str | None:
        if self.proxy_url is None:
            return None
        return self.proxy_url.split("://", 1)[0]


def validate_proxy_rules(rules: tuple[ProxyRule, ...]) -> tuple[ProxyRule, ...]:
    """Reference validation semantics (policy.py:437-499): raises
    ValueError exactly where the reference raises
    PolicyValidationError."""
    last = len(rules) - 1
    for i, r in enumerate(rules):
        loc = f"proxy rule #{i + 1}"
        if i < last:
            if not (r.pattern or "").strip():
                raise ValueError(f"Pattern is required ({loc})")
            try:
                re.compile(r.pattern)
            except re.error:
                raise ValueError(f"Invalid regular expression ({loc})")
            if r.match not in (MATCHES, DOES_NOT_MATCH):
                raise ValueError(f"Match selector is required ({loc})")
            if not r.proxy_url:
                raise ValueError(f"Proxy URL is required ({loc})")
        else:
            # terminal rule may not carry pattern/match (an explicit
            # non-default match is detectable; default MATCHES is not)
            if r.pattern is not None or r.match != MATCHES:
                raise ValueError("Pattern is not allowed (last proxy rule)")
        if r.proxy_url is not None and r.proxy_type not in PROXY_SCHEMES:
            raise ValueError(
                "Must have a valid URL with one of the following schemes: "
                + ", ".join(PROXY_SCHEMES) + f" ({loc})"
            )
    return rules


@dataclass(frozen=True)
class Limits:
    max_cost: float | None = None
    max_items: int | None = None
    max_duration: float | None = None


@dataclass(frozen=True)
class RobotsPolicy:
    usage: str = OBEY                # OBEY | INVERT | IGNORE
    obey_crawl_delay: bool = True
    # crawl sitemaps listed in robots.txt (reference
    # policy.py:568-579 `read_sitemaps`, robots.py:280-284
    # `get_sitemaps`); when on, sitemap URLs from the seed hosts'
    # robots files are seeded into the frontier at job start
    read_sitemaps: bool = False


@dataclass(frozen=True)
class Normalization:
    enabled: bool = True
    strip_parameters: tuple[str, ...] = ()


@dataclass(frozen=True)
class Policy:
    url_rules: tuple[UrlRule, ...] = (UrlRule(ADD, 1.0),)
    mime_rules: tuple[MimeRule, ...] = (MimeRule(True),)
    limits: Limits = field(default_factory=Limits)
    robots: RobotsPolicy = field(default_factory=RobotsPolicy)
    normalization: Normalization = field(default_factory=Normalization)
    user_agent: str = "starbelly-spark/0.1"
    # multi-user-agent rotation (reference policy.py:820-834 holds a
    # LIST of agents; downloader.py:279-280 picks one per request via
    # random.choice, robots.py:88 always checks the FIRST).  Empty ⇒
    # the single ``user_agent``.  Per-request choice here is
    # DETERMINISTIC — crc32(url) mod n (crawl order must be a pure
    # function of state) — see ``agent_for`` / ``user_agent_expr``.
    user_agents: tuple[str, ...] = ()
    # reference policies reference a captcha_solver by id; the solver
    # doc is joined in at job start (db.py:325-337) — see captcha.py
    captcha_solver_id: str | None = None
    # first-match proxy routing (policy.py:394-521); default = the
    # reference's "never proxy" single terminal rule
    proxy_rules: tuple[ProxyRule, ...] = (ProxyRule(),)

    def agents(self) -> tuple[str, ...]:
        """The effective user-agent list (≥1; first = robots agent)."""
        return self.user_agents or (self.user_agent,)

    def agent_for(self, url: str) -> str:
        """Deterministic per-request agent: crc32(url) mod n — the
        reproducible analogue of the reference's ``random.choice``
        (``policy.py:829-834``).  Must agree with ``user_agent_expr``
        bit-for-bit (Spark's ``crc32`` == ``zlib.crc32``)."""
        import zlib

        ag = self.agents()
        return ag[zlib.crc32(url.encode()) % len(ag)]

    @staticmethod
    def from_doc(doc: dict) -> "Policy":
        """Build from the reference's policy-document layout
        (FIXTURES.md §8)."""
        url_rules = tuple(
            UrlRule(
                action=r["action"],
                amount=float(r["amount"]),
                pattern=r.get("pattern"),
                match=r.get("match", MATCHES),
            )
            for r in doc.get("url_rules", [{"action": ADD, "amount": 1.0}])
        )
        mime_rules = tuple(
            MimeRule(
                save=bool(r["save"]),
                pattern=r.get("pattern"),
                match=r.get("match", MATCHES),
            )
            for r in doc.get("mime_type_rules", [{"save": True}])
        )
        proxy_docs = doc.get("proxy_rules", [{}])
        last_doc = proxy_docs[-1] if proxy_docs else {}
        if "pattern" in last_doc or "match" in last_doc:
            # doc-level detection of an explicit (even default-valued)
            # match/pattern on the terminal rule (policy.py:471-475)
            raise ValueError("Pattern is not allowed (last proxy rule)")
        proxy_rules = validate_proxy_rules(tuple(
            ProxyRule(
                proxy_url=r.get("proxy_url"),
                pattern=r.get("pattern"),
                match=r.get("match", MATCHES),
            )
            for r in proxy_docs
        ))
        lim = doc.get("limits", {})
        rob = doc.get("robots_txt", {})
        norm = doc.get("url_normalization", {})
        return Policy(
            url_rules=url_rules,
            mime_rules=mime_rules,
            limits=Limits(
                max_cost=lim.get("max_cost"),
                max_items=lim.get("max_items"),
                max_duration=lim.get("max_duration"),
            ),
            robots=RobotsPolicy(
                usage=rob.get("usage", OBEY),
                obey_crawl_delay=rob.get("obey_crawl_delay", True),
                # reference default False (policy.py:568-569)
                read_sitemaps=rob.get("read_sitemaps", False),
            ),
            normalization=Normalization(
                enabled=norm.get("enabled", True),
                strip_parameters=tuple(norm.get("strip_parameters", ())),
            ),
            user_agent=(doc.get("user_agents") or [{"name": "starbelly-spark/0.1"}])[0]["name"],
            user_agents=tuple(
                d["name"] for d in doc.get("user_agents") or []
            ),
            captcha_solver_id=doc.get("captcha_solver_id"),
            proxy_rules=proxy_rules,
        )


def expand_seed_domains(pattern: str, seed_domains: list[str]) -> str:
    """Replace {SEED_DOMAINS} with an escaped alternation of domains."""
    if SEED_DOMAINS_TOKEN not in pattern:
        return pattern
    alt = "|".join(re.escape(d) for d in sorted(set(seed_domains)))
    return pattern.replace(SEED_DOMAINS_TOKEN, f"({alt})")


def _apply(action: str, amount: float, parent_cost: Column) -> Column:
    if action == ADD:
        return parent_cost + F.lit(amount)
    if action == MULTIPLY:
        return parent_cost * F.lit(amount)
    raise ValueError(f"unknown action {action!r}")


def cost_expr(
    policy: Policy, url_col: Column, parent_cost_col: Column,
    seed_domains: list[str] | None = None,
) -> Column:
    """First-match URL-rule chain → new cost column expression."""
    seed_domains = seed_domains or []
    expr = None
    # Build the chain back-to-front so first rule wins.
    for rule in reversed(policy.url_rules):
        applied = _apply(rule.action, rule.amount, parent_cost_col)
        if rule.pattern is None:
            expr = applied  # terminal
            continue
        pat = expand_seed_domains(rule.pattern, seed_domains)
        cond = url_col.rlike(pat)
        if rule.match == DOES_NOT_MATCH:
            cond = ~cond
        expr = F.when(cond, applied).otherwise(
            expr if expr is not None else parent_cost_col
        )
    assert expr is not None
    return expr


def cost_gate_expr(policy: Policy, cost_col: Column) -> Column:
    """P7: keep a link only when 0 < cost ≤ max_cost."""
    keep = cost_col > F.lit(0.0)
    if policy.limits.max_cost is not None:
        keep = keep & (cost_col <= F.lit(float(policy.limits.max_cost)))
    return keep


def mime_save_expr(policy: Policy, content_type_col: Column) -> Column:
    """P9: first-match MIME rule chain → boolean save column."""
    base = content_type_col.isNotNull()  # parse failure → not saved
    expr = None
    for rule in reversed(policy.mime_rules):
        saved = F.lit(bool(rule.save))
        if rule.pattern is None:
            expr = saved
            continue
        cond = content_type_col.rlike(rule.pattern)
        if rule.match == DOES_NOT_MATCH:
            cond = ~cond
        expr = F.when(cond, saved).otherwise(
            expr if expr is not None else F.lit(False)
        )
    assert expr is not None
    return base & expr


def make_mime_should_save(policy: Policy):
    """Pure-Python twin of ``mime_save_expr`` for the FETCH KERNEL's
    download gate (reference ``downloader.py:25-30,194-213``: the MIME
    type is checked when response HEADERS arrive and a disallowed type
    raises ``MimeNotAllowedError``, aborting the transfer BEFORE the
    body is read).  Must agree with ``mime_save_expr`` rule-for-rule:
    first-match chain, unanchored regex search, no-terminal → False,
    null content-type → False (but the kernel only gates rows that
    HAVE a content type — exceptions carry none, as in the
    reference)."""
    compiled = [
        (re.compile(r.pattern) if r.pattern is not None else None,
         r.match, bool(r.save))
        for r in policy.mime_rules
    ]

    def should_save(content_type: str | None) -> bool:
        if content_type is None:
            return False
        for pat, match, save in compiled:
            if pat is None:
                return save
            hit = pat.search(content_type) is not None
            if hit if match == MATCHES else not hit:
                return save
        return False

    return should_save


def proxy_expr(policy: Policy, url_col: Column) -> Column:
    """Data-plane half of the reference's proxy routing
    (``starbelly/policy.py:501-521`` ``get_proxy_url``): a first-match
    when/rlike chain producing a ``struct(proxy_type, proxy_url)``
    column.  ``rlike`` is unanchored search, exactly the reference's
    ``pattern.search(target_url)``; selection fires when
    ``has_match == needs_match``.  The fetch kernel consumes
    ``proxy_url`` per row the way it consumes sessions — JVM-side
    expression, no Python in the chain."""
    # empty rule list ≡ the reference's "never proxy" default
    rules = validate_proxy_rules(policy.proxy_rules or (ProxyRule(),))

    def _val(r: ProxyRule) -> Column:
        return F.struct(
            F.lit(r.proxy_type).cast("string").alias("proxy_type"),
            F.lit(r.proxy_url).cast("string").alias("proxy_url"),
        )

    terminal = rules[-1]
    # terminal: proxy_url if set, else (None, None) — policy.py:517-519
    expr = _val(terminal)
    for rule in reversed(rules[:-1]):
        cond = url_col.rlike(rule.pattern)
        if rule.match == DOES_NOT_MATCH:
            cond = ~cond
        expr = F.when(cond, _val(rule)).otherwise(expr)
    return expr


def user_agent_expr(policy: Policy, url_col: Column) -> Column:
    """Per-request user-agent as a JVM expression: the agent list is a
    literal array indexed by ``crc32(url) mod n`` — deterministic twin
    of the reference's per-request ``random.choice``
    (``starbelly/policy.py:829-834``, ``downloader.py:279-280``).
    Robots checks use the FIRST agent only (``robots.py:88``) — that
    path goes through ``policy.user_agent`` / ``agents()[0]``."""
    ag = policy.agents()
    if len(ag) == 1:
        return F.lit(ag[0])
    # F.get is 0-based and never throws under ANSI (unlike element_at)
    return F.get(
        F.array(*[F.lit(a) for a in ag]),
        F.pmod(F.crc32(url_col.cast("binary")), F.lit(len(ag))).cast("int"),
    )


def scheme_filter_expr(url_col: Column) -> Column:
    """P10: keep only http/https links (extractor.py:232-233)."""
    return url_col.rlike("^https?://")


# Canonical policy fixtures mirroring the reference's container
# fixtures (tools/container_init.py:118-180 — "Broad Crawl": max_cost 3,
# depth +1; "Deep Crawl": max_cost 10, stay-in-domain via MULTIPLY 0).
BROAD_CRAWL = Policy(
    url_rules=(UrlRule(ADD, 1.0),),
    limits=Limits(max_cost=3.0),
)

def make_deep_crawl(max_cost: float = 10.0) -> Policy:
    """Stay-in-seed-domain policy: in-domain links cost +1, everything
    else ×0 (pruned by the cost gate)."""
    return Policy(
        url_rules=(
            UrlRule(ADD, 1.0, pattern=f"^https?://{SEED_DOMAINS_TOKEN}"),
            UrlRule(MULTIPLY, 0.0),
        ),
        limits=Limits(max_cost=max_cost),
    )
