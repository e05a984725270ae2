"""HTML → span-document converter: the production seam of the real-HTTP
fetch stage (plans/fetch_http.py marks where it plugs in).

Converts real tag soup into the engine's span rows
(kind, text, media_ref, offset), mirroring what the reference extracts
from a fetched page (file:line in /root/reference/src):

- <a href=...>            → 'link' span, text = raw href value.
  Parse.hs:47-51 (getRawHrefs): every attribute named href
  (case-insensitive) on every <a> open tag, in page order; the trim
  happens downstream (crawl_logic.extract_raw_links), matching
  `trim . snd` at Parse.hs:50.
- <img src=...>           → 'media' span, media_ref = raw src. The
  reference ignores images; the span model is interleaved text+media,
  so the converter surfaces them (documented extension — an equivalent
  span web carries the same media spans, so traces still match).
- <meta http-equiv=refresh content="...;url=X"> before the first
  </head> → 'meta_refresh' span, text = raw target. Parse.hs:22-38
  (findPageRedirect): attrs lowercased on both key AND value
  (`both (C8.map toLower)`), only tags before the first close-head
  (`takeWhile (not . isTagCloseName "head")`), first qualifying meta
  wins; content split on [' ', ';'], first token starting with "url"
  (case-insensitive), target = after the first '=', up to whitespace.
  Resolution against the *scheduled* URL happens downstream
  (crawl_logic.find_meta_refresh + the round loop), like Crawl.hs:130.
- <form>…</form>          → 'form' span, text = JSON
  {method, action, inputs:[{key,value}]}. Forms.hs:22-54: method/action
  from the open tag's attributes (case-insensitive; defaults GET / ""),
  inputs = every <input> tag until the FIRST subsequent </form>
  (takeWhilePlus1 over `sections (isTagOpenName "form")` — overlapping
  sections for nested opens: a later open's inputs also belong to every
  still-open earlier form, and one </form> closes them all). Input key =
  first 'name' attr, value = first 'value' attr or null
  (discoverFormParameter, Forms.hs:92-97; inputs without a name are
  dropped there, so they are dropped here).
- text nodes (outside <script>/<style>) → 'text' spans. body_text =
  concatenated text spans is the engine's established analog of the raw
  body bytes the reference hands to direction regexes
  (Directions.hs:37) — direction rules written for this engine match
  against visible text, not markup.

Set-Cookie / require_cookie are transport-level in the fixture model and
never appear in markup, so the converter does not emit them.

html.parser is lenient tag soup like tagsoup: unclosed tags, bare
attributes, and broken nesting all degrade instead of raising.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser


class _SpanParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.spans: list[dict] = []
        self._n = 0
        # overlapping open-form collectors (Forms.hs sections semantics)
        self._open_forms: list[dict] = []
        self._seen_head_close = False
        self._meta_refresh_done = False
        self._skip_text_depth = 0  # inside <script>/<style>

    def _next_offset(self) -> int:
        n = self._n
        self._n += 1
        return n

    def _emit(self, kind: str, text: str | None = None, media_ref: str | None = None,
              offset: int | None = None) -> None:
        self.spans.append({
            "kind": kind,
            "text": text,
            "media_ref": media_ref,
            "offset": self._next_offset() if offset is None else offset,
        })

    # --- tags ---------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        # html.parser lowercases tag and attribute NAMES already — the
        # analog of tagsoup's case-insensitive `mk k` comparisons
        if tag == "a":
            for k, v in attrs:
                if k == "href":
                    self._emit("link", text=v if v is not None else "")
        elif tag == "img":
            for k, v in attrs:
                if k == "src" and v:
                    self._emit("media", media_ref=v)
                    break
        elif tag == "meta":
            self._maybe_meta_refresh(attrs)
        elif tag == "form":
            # offset reserved at the OPEN tag so form spans sort in page
            # order even though they are emitted at the close tag
            self._open_forms.append({
                "offset": self._next_offset(),
                "attrs": attrs,
                "inputs": [],
            })
        elif tag == "input":
            inp = self._discover_input(attrs)
            if inp is not None:
                for f in self._open_forms:
                    f["inputs"].append(inp)
        elif tag in ("script", "style"):
            self._skip_text_depth += 1

    def handle_endtag(self, tag):
        if tag == "head":
            self._seen_head_close = True
        elif tag == "form":
            # one close-form ends EVERY open section (takeWhilePlus1 stops
            # each section at the first close after its open)
            for f in self._open_forms:
                self._emit_form(f)
            self._open_forms = []
        elif tag in ("script", "style") and self._skip_text_depth:
            self._skip_text_depth -= 1

    def handle_data(self, data):
        if self._skip_text_depth == 0 and data.strip():
            self._emit("text", text=data)

    def close(self):
        super().close()
        # unclosed forms at EOF: tagsoup sections still yield them (the
        # section just runs to end-of-document)
        for f in self._open_forms:
            self._emit_form(f)
        self._open_forms = []

    # --- helpers ------------------------------------------------------

    @staticmethod
    def _first_attr(attrs, name: str) -> str | None:
        for k, v in attrs:
            if k == name:
                return v if v is not None else ""
        return None

    @staticmethod
    def _discover_input(attrs) -> dict | None:
        """Forms.hs:92-97: key = first 'name' attr (inputs without one are
        dropped), value = first 'value' attr or null."""
        name = _SpanParser._first_attr(attrs, "name")
        if name is None:
            return None
        return {"key": name, "value": _SpanParser._first_attr(attrs, "value")}

    def _emit_form(self, f: dict) -> None:
        method = self._first_attr(f["attrs"], "method")
        action = self._first_attr(f["attrs"], "action")
        self._emit(
            "form",
            text=json.dumps({
                "method": method if method else "GET",
                "action": action if action is not None else "",
                "inputs": f["inputs"],
            }),
            offset=f["offset"],
        )

    def _maybe_meta_refresh(self, attrs) -> None:
        if self._meta_refresh_done or self._seen_head_close:
            return
        # both key and value lowercased (Parse.hs:36 `both (C8.map toLower)`)
        if not any(
            k == "http-equiv" and (v or "").lower() == "refresh" for k, v in attrs
        ):
            return
        content = self._first_attr(attrs, "content") or ""
        # split on ' ' and ';', first token starting with "url" (any case)
        target = None
        for part in _split_ws_semi(content):
            if part.lower().startswith("url"):
                # breakAfter "=": everything after the first '=', then
                # takeWhile (not . isSpace)
                i = part.find("=")
                rest = part[i + 1:] if i >= 0 else ""
                target = rest.split()[0] if rest.split() else ""
                break
        if target is None:
            return  # no url section ⇒ not a redirect (findPageRedirect's find fails)
        self._meta_refresh_done = True
        self._emit("meta_refresh", text=target)


def _split_ws_semi(s: str) -> list[str]:
    out, cur = [], []
    for ch in s:
        if ch in (" ", ";"):
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def html_to_spans(html: str) -> list[dict]:
    """Parse tag soup into span rows (kind, text, media_ref, offset).

    Never raises on malformed markup — html.parser degrades like tagsoup.
    """
    p = _SpanParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is robust, but a pathological document must degrade
        # to "whatever was extracted so far", never a stage failure
        pass
    return p.spans
