"""Minimal markdown -> HTML compiler (no external deps in this container).

The reference serves markdown through `marked` with GitHub-style heading
anchors (gfmHeadingId) so markdown headings become fragment targets and
markdown links become <a href> (reference /root/reference/src/server.ts:11-12,
147-165; fragment tests /root/reference/test/test.fragments.ts:414-455).

We only need the *link-bearing* subset: inline links/images, autolinks,
reference-style links, headings with gfm ids, and raw inline HTML passthrough.
"""

from __future__ import annotations

import re

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_IMG_RE = re.compile(r"!\[([^\]]*)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")
_LINK_RE = re.compile(r"(?<!\!)\[([^\]]*)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")
_AUTOLINK_RE = re.compile(r"<(https?://[^>\s]+)>")
# gfm email autolink: <user@host> -> mailto (marked renders the reference's
# LICENSE.md author email as a mailto link, reference test.index.ts:576-589)
_EMAIL_AUTOLINK_RE = re.compile(r"<([\w.+-]+@[\w-]+(?:\.[\w-]+)+)>")
_REF_DEF_RE = re.compile(r"^\s{0,3}\[([^\]]+)\]:\s*(\S+)\s*$")
_REF_LINK_RE = re.compile(r"(?<!\!)\[([^\]]+)\]\[([^\]]*)\]")


def gfm_heading_id(text: str) -> str:
    """GitHub heading anchor: lowercase, strip punctuation, spaces -> '-'."""
    s = re.sub(r"<[^>]*>", "", text).strip().lower()
    s = re.sub(r"[^\w\- ]", "", s)
    return s.replace(" ", "-")


def markdown_to_html(md: str) -> str:
    lines = md.split("\n")
    # collect reference-style definitions first
    refs: dict[str, str] = {}
    body_lines: list[str] = []
    for line in lines:
        m = _REF_DEF_RE.match(line)
        if m:
            refs[m.group(1).lower()] = m.group(2)
        else:
            body_lines.append(line)

    out: list[str] = []
    in_code = False
    for line in body_lines:
        if line.strip().startswith("```"):
            in_code = not in_code
            continue
        if in_code:
            continue
        m = _HEADING_RE.match(line)
        if m:
            level = len(m.group(1))
            text = m.group(2)
            hid = gfm_heading_id(text)
            inner = _render_inline(text, refs)
            out.append(f'<h{level} id="{hid}">{inner}</h{level}>')
            continue
        out.append(f"<p>{_render_inline(line, refs)}</p>" if line.strip() else "")
    return "\n".join(out)


def _render_inline(text: str, refs: dict[str, str]) -> str:
    text = _IMG_RE.sub(lambda m: f'<img alt="{m.group(1)}" src="{m.group(2)}">', text)
    text = _LINK_RE.sub(lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', text)

    def ref_sub(m: re.Match) -> str:
        key = (m.group(2) or m.group(1)).lower()
        url = refs.get(key)
        return f'<a href="{url}">{m.group(1)}</a>' if url else m.group(0)

    text = _REF_LINK_RE.sub(ref_sub, text)
    text = _AUTOLINK_RE.sub(lambda m: f'<a href="{m.group(1)}">{m.group(1)}</a>', text)
    text = _EMAIL_AUTOLINK_RE.sub(
        lambda m: f'<a href="mailto:{m.group(1)}">{m.group(1)}</a>', text)
    return text
