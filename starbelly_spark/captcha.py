"""CAPTCHA-solver plumbing (SURVEY.md J3; reference
``/root/reference/starbelly/captcha.py:1-147``, policy→solver join
``starbelly/db.py:325-337``).

The reference stores solver configs in a ``captcha_solver`` table; a
policy references one by ``captcha_solver_id`` and the solver doc is
joined into the policy at job start.  ``CaptchaSolver.get_command``
builds the antigate-style ImageToTextTask JSON — byte-compatible with
the reference's command shape so a real solving service could be
dropped in.  The network call itself is out of sandbox scope; the
login flow uses ``solve_deterministic`` (a documented stand-in whose
output respects the solver's characters / length constraints).
"""

from __future__ import annotations

import base64
import hashlib
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHANUMERIC = "ALPHANUMERIC"
NUMERIC_ONLY = "NUMERIC_ONLY"
ALPHA_ONLY = "ALPHA_ONLY"

SOLVER_SCHEMA = (
    "solver_id string, name string, service_url string, api_key string, "
    "require_phrase boolean, case_sensitive boolean, characters string, "
    "require_math boolean, min_length int, max_length int"
)


@dataclass(frozen=True)
class CaptchaSolver:
    solver_id: str
    name: str
    service_url: str
    api_key: str
    require_phrase: bool = False
    case_sensitive: bool = False
    characters: str = ALPHANUMERIC
    require_math: bool = False
    min_length: int = 0
    max_length: int = 0

    @staticmethod
    def from_doc(doc: dict) -> "CaptchaSolver":
        return CaptchaSolver(
            solver_id=doc["id"],
            name=doc["name"],
            service_url=doc["service_url"],
            api_key=doc["api_key"],
            require_phrase=bool(doc.get("require_phrase", False)),
            case_sensitive=bool(doc.get("case_sensitive", False)),
            characters=doc.get("characters", ALPHANUMERIC),
            require_math=bool(doc.get("require_math", False)),
            min_length=int(doc.get("min_length", 0)),
            max_length=int(doc.get("max_length", 0)),
        )

    def get_command(self, img_data: bytes) -> dict:
        """The antigate-style ImageToTextTask command (reference
        captcha.py:26-58, same field names and numeric encoding)."""
        if self.characters == ALPHANUMERIC:
            numeric = 0
        elif self.characters == NUMERIC_ONLY:
            numeric = 1
        elif self.characters == ALPHA_ONLY:
            numeric = 2
        else:
            raise ValueError(
                f"Invalid characters setting: {self.characters}"
            )
        return {
            "clientKey": self.api_key,
            "task": {
                "type": "ImageToTextTask",
                "body": base64.b64encode(img_data).decode("ascii"),
                "phrase": self.require_phrase,
                "case": self.case_sensitive,
                "numeric": numeric,
                "math": self.require_math,
                "minLength": self.min_length,
                "maxLength": self.max_length,
            },
        }

    def solve_deterministic(self, img_data: bytes) -> str:
        """Sandbox stand-in for the solving service: a deterministic
        solution derived from the image bytes, shaped by the solver's
        characters / length settings (a real deployment swaps this for
        an HTTP call built from ``get_command``)."""
        digest = hashlib.blake2b(img_data, digest_size=16).hexdigest()
        if self.characters == NUMERIC_ONLY:
            text = str(int(digest, 16))
        elif self.characters == ALPHA_ONLY:
            text = "".join(
                chr(ord("a") + int(c, 16) % 26) for c in digest
            )
        else:
            text = digest
        n = max(self.min_length, 6)
        if self.max_length:
            n = min(n, self.max_length)
        return text[:n]


def resolve_captcha_solver(
    policy_doc: dict, solvers: dict[str, dict]
) -> dict:
    """The db.py:325-337 join: pop ``captcha_solver_id`` off the policy
    doc and embed the full solver doc (None id → no solver)."""
    doc = dict(policy_doc)
    solver_id = doc.pop("captcha_solver_id", None)
    if solver_id is not None:
        doc["captcha_solver"] = solvers[solver_id]
    return doc


def solver_lookup(jobs: DataFrame, solvers: DataFrame) -> DataFrame:
    """Set-oriented J3: broadcast hash join jobs→solver config by id
    (the Spark form of the per-row ``get(captcha_solver_id)``)."""
    return jobs.join(
        F.broadcast(solvers),
        jobs["captcha_solver_id"] == solvers["solver_id"],
        "left",
    )
