"""Login-form classification + login request construction (J5).

The reference classifies every form on a login page with formasaurus
and picks the form/fields with the highest ``login`` / ``username`` /
``password`` probabilities (``/root/reference/starbelly/login.py:
39-90`` ``select_login_form`` / ``select_login_fields``, driven from
``get_login_form`` at login.py:185-233).  formasaurus is an ML model
not present in this container, so ``classify_forms`` is a
deterministic heuristic stand-in that produces the SAME nested
probability shape — ``(form, {"form": {label: prob}, "fields":
{name: {label: prob}}})`` — and the selection functions reproduce the
reference's argmax semantics exactly (they are pure public behavior,
not model weights).

Driver-side by design: logins run once per credentialed domain per
job (a config dimension, not a data dimension), exactly where the
reference runs them — before the domain's first fetch.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

_FORM_RE = re.compile(r"<form\b([^>]*)>(.*?)</form>", re.I | re.S)
_ATTR_RE = {
    k: re.compile(rf"""\b{k}\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
    for k in ("action", "method", "name", "type", "src", "value")
}
_INPUT_RE = re.compile(r"<input\b[^>]*>", re.I)
_IMG_RE = re.compile(r"<img\b[^>]*>", re.I)


def _attr(tag: str, name: str) -> str | None:
    m = _ATTR_RE[name].search(tag)
    if not m:
        return None
    return next(g for g in m.groups() if g is not None)


def classify_forms(html: str) -> list[tuple[dict, dict]]:
    """Parse ``<form>`` blocks and assign deterministic label
    probabilities (the formasaurus stand-in).  Returns the reference's
    ``extract_forms(..., proba=True)`` shape: a list of
    ``(form, meta)`` where ``form`` is a dict with ``action``,
    ``method``, ``fields`` (name → prefilled value) and
    ``captcha_img`` (src of the first <img> in the form, if any), and
    ``meta`` has nested label probabilities."""
    out = []
    for m in _FORM_RE.finditer(html):
        attrs, body = m.group(1), m.group(2)
        inputs = []
        for tag in _INPUT_RE.findall(body):
            name = _attr(tag, "name")
            if name:
                inputs.append((name, (_attr(tag, "type") or "text").lower(),
                               _attr(tag, "value") or ""))
        field_probs: dict[str, dict[str, float]] = {}
        has_password = False
        for name, typ, _val in inputs:
            low = name.lower()
            probs: dict[str, float] = {}
            if typ == "password":
                probs["password"] = 0.95
                has_password = True
            elif "captcha" in low:
                probs["captcha"] = 0.9
            elif any(t in low for t in ("user", "login", "email")):
                probs["username"] = 0.55 + 0.3 * ("user" in low)
            elif typ in ("text",):
                probs["username"] = 0.2     # weak default for bare text
            if any(t in low for t in ("search", "q")) and typ == "text":
                probs = {"search query": 0.9}
            field_probs[name] = probs
        action = _attr(attrs, "action") or ""
        low_action = action.lower()
        login_p = 0.05
        if has_password:
            login_p = 0.8
            if any(t in low_action for t in ("login", "signin", "auth")):
                login_p = 0.95
        elif any(t in low_action for t in ("login", "signin")):
            login_p = 0.4                    # looks like login, no pw field
        search_p = 0.9 if any(
            "search query" in p for p in field_probs.values()
        ) else 0.05
        img = _IMG_RE.search(body)
        form = {
            "action": action,
            "method": (_attr(attrs, "method") or "GET").upper(),
            "fields": {name: val for name, _typ, val in inputs},
            "captcha_img": _attr(img.group(0), "src") if img else None,
        }
        meta = {
            "form": {"login": login_p, "search": search_p,
                     "other": max(0.0, 1.0 - login_p - search_p)},
            "fields": field_probs,
        }
        out.append((form, meta))
    return out


def select_login_form(forms):
    """Argmax over the ``login`` class probability — the reference's
    selection exactly (login.py:70-90)."""
    login_form = login_meta = None
    login_prob = 0.0
    for form, meta in forms:
        for type_, prob in meta["form"].items():
            if type_ == "login" and prob > login_prob:
                login_form, login_meta, login_prob = form, meta, prob
    return login_form, login_meta


def select_login_fields(fields):
    """Per-label argmax over field probabilities — the reference's
    selection exactly (login.py:39-67)."""
    username_field = password_field = captcha_field = None
    u_p = p_p = c_p = 0.0
    for field_name, labels in fields.items():
        for label, prob in labels.items():
            if label in ("username", "username or email") and prob > u_p:
                username_field, u_p = field_name, prob
            elif label == "password" and prob > p_p:
                password_field, p_p = field_name, prob
            elif label == "captcha" and prob > c_p:
                captcha_field, c_p = field_name, prob
    return username_field, password_field, captcha_field


def build_login_request(
    page_url: str,
    html: str,
    username: str,
    password: str,
    solver=None,
    captcha_image_fetch=None,
) -> tuple[str, str, dict]:
    """The reference's ``get_login_form`` flow (login.py:185-233):
    classify forms → pick the login form → pick username/password/
    captcha fields → substitute credentials (+ solved captcha) →
    resolve the form action against the page URL.

    Returns ``(action_url, method, fields)``.  Raises when no login
    form or no username/password fields are found, and when a captcha
    is required but no solver is configured — all reference-matching
    error cases."""
    forms = classify_forms(html)
    form, meta = select_login_form(forms)
    if form is None:
        raise ValueError("Can't find login form")
    login_field, password_field, captcha_field = select_login_fields(
        meta["fields"]
    )
    if login_field is None or password_field is None:
        raise ValueError("Can't find username/password fields")
    fields = dict(form["fields"])
    fields[login_field] = username
    fields[password_field] = password
    if captcha_field is not None:
        if solver is None:
            raise ValueError(
                f"CAPTCHA required for login url={page_url} but there is"
                " no CAPTCHA solver available"
            )
        if form["captcha_img"] is None:
            raise ValueError("Cannot locate CAPTCHA image")
        img_src = urljoin(page_url, form["captcha_img"])
        img_data = (captcha_image_fetch(img_src) if captcha_image_fetch
                    else img_src.encode())
        fields[captcha_field] = solver.solve_deterministic(img_data)
    return urljoin(page_url, form["action"]), form["method"], fields
