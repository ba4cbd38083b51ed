"""The pinned reference text extractor (html bytes -> canonical text).

This is the per-row invariant from BASELINE.json's ``input_hint``: the
engine's distributed extraction stage must produce **byte-identical** text
per url to this single-process function (pinned via per-url SHA-256 in
pytest). The function is deliberately dependency-free and deterministic:
a pure function of the ``html`` bytes only.

Extraction contract (our own definition — the reference repo has no web
extractor; it consumes Mongo/MySQL records, see SURVEY.md §0):
  - decode bytes as UTF-8 (errors -> quarantine, mirroring the reference's
    log-and-skip per-record policy, GrameneMongoLoader.groovy:35-38)
  - the main content is the first ``<article>...</article>`` element
  - text = the concatenation of ``<p>...</p>`` contents inside it, with
    HTML entities unescaped, joined by a blank line ("\n\n")
  - no article element, or article with no paragraphs -> quarantine (None)
"""

from __future__ import annotations

import hashlib
import html as _html
import re

_ARTICLE = re.compile(rb"<article>(.*?)</article>", re.S)
_PARA = re.compile(r"<p>(.*?)</p>", re.S)


def extract_text(html_bytes: bytes | None) -> str | None:
    """Extract canonical text from raw page bytes; ``None`` = quarantine."""
    if html_bytes is None:
        return None
    m = _ARTICLE.search(html_bytes)
    if m is None:
        return None
    try:
        body = m.group(1).decode("utf-8")
    except UnicodeDecodeError:
        return None
    paras = _PARA.findall(body)
    if not paras:
        return None
    return "\n\n".join(_html.unescape(p) for p in paras)


def text_sha256(text: str) -> str:
    """Stable per-url fingerprint of extracted text (utf-8 bytes)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
