"""HTML main-content extraction: tokenize → DOM → density heuristics → Markdown.

From-scratch re-expression of the *semantics* the reference delegates
to its conversion core (reference services/document_service.py:187-392
routes documents into MinerU's layout analysis; our HTML leg replaces
that with classic boilerplate-stripping heuristics per the north_rule:
"HTML boilerplate strip ... text-density/link-density DOM heuristics,
tag-tree pruning").

Determinism rules (SURVEY.md §7.4): integer-only scores, fixed prune
tables, stable document-order traversal, fixed whitespace policy.
Failures yield (ok=False, error_kind) rather than raising — the
reference's error-artifact semantics (services/document_service.py:
347-383): a bad row must never abort the pipeline.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from ..config import DEFAULT_CONFIG, ExtractConfig
from .decode import decode_bytes
from .markdown import Block, render

# ---------------------------------------------------------------- DOM model

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# content of these is dropped entirely (never text)
DROP_CONTENT_TAGS = frozenset(
    "script style noscript template svg iframe head title object canvas".split()
)

# structural boilerplate: pruned outright regardless of density
BOILERPLATE_TAGS = frozenset("nav header footer aside form button select".split())

# class/id token blocklist (fixed; lowercase token match, not substring)
BOILERPLATE_TOKENS = frozenset(
    (
        "nav navbar menu topbar header footer sidebar aside breadcrumb "
        "comment comments cookie cookies banner ad ads advert promo social "
        "share sharing related pagination widget copyright legal"
    ).split()
)

BLOCK_TAGS = frozenset(
    (
        "p div section article main body h1 h2 h3 h4 h5 h6 ul ol li table "
        "pre blockquote figure figcaption tr td th thead tbody dl dt dd"
    ).split()
)

INLINE_MD = {
    "b": ("**", "**"),
    "strong": ("**", "**"),
    "i": ("*", "*"),
    "em": ("*", "*"),
    "code": ("`", "`"),
}

_WS_RE = re.compile(r"\s+")
_TOKEN_SPLIT_RE = re.compile(r"[\s_\-]+")


@dataclass
class Node:
    tag: str
    attrs: dict = field(default_factory=dict)
    children: list = field(default_factory=list)  # Node | str


class _TreeBuilder(HTMLParser):
    """Error-tolerant tree builder over stdlib HTMLParser events.

    Mis-nested end tags: pop up to the nearest matching open tag if one
    exists in the stack, else ignore — deterministic recovery for the
    adversarial fixtures (unclosed / mis-nested tags, FIXTURES.md §2).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack: list[Node] = [self.root]
        self._drop_depth = 0

    def handle_starttag(self, tag: str, attrs: list) -> None:
        if self._drop_depth:
            if tag in DROP_CONTENT_TAGS and tag not in VOID_TAGS:
                self._drop_depth += 1
            return
        if tag in DROP_CONTENT_TAGS:
            if tag not in VOID_TAGS:
                self._drop_depth = 1
            return
        adict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v if v is not None else ""
        node = Node(tag, adict)
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            # implicit close: p/li/td/th/tr cannot nest within themselves
            if tag in ("p", "li", "tr", "td", "th", "option"):
                for i in range(len(self.stack) - 1, 0, -1):
                    if self.stack[i].tag == tag:
                        del self.stack[i:]
                        self.stack[-1].children.append(node)
                        break
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        if self._drop_depth or tag in DROP_CONTENT_TAGS:
            return
        adict = {}
        for k, v in attrs:
            if k not in adict:
                adict[k] = v if v is not None else ""
        self.stack[-1].children.append(Node(tag, adict))

    def handle_endtag(self, tag: str) -> None:
        if self._drop_depth:
            if tag in DROP_CONTENT_TAGS:
                self._drop_depth -= 1
            return
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # no matching open tag → ignore stray end tag

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self.stack[-1].children.append(data)


def parse_html(text: str) -> Node:
    tb = _TreeBuilder()
    tb.feed(text)
    tb.close()
    return tb.root


# ---------------------------------------------------------- density scoring


def _is_boiler_attr(node: Node) -> bool:
    blob = (node.attrs.get("class", "") + " " + node.attrs.get("id", "")).lower()
    if not blob.strip():
        return False
    for tok in _TOKEN_SPLIT_RE.split(blob):
        if tok in BOILERPLATE_TOKENS:
            return True
    return False


def _text_link_chars(node, in_link: bool = False) -> tuple[int, int]:
    """(total text chars, chars under <a>) — whitespace-collapsed lengths."""
    if isinstance(node, str):
        n = len(_WS_RE.sub(" ", node).strip())
        return n, (n if in_link else 0)
    t = l = 0
    link = in_link or node.tag == "a"
    for c in node.children:
        ct, cl = _text_link_chars(c, link)
        t += ct
        l += cl
    return t, l


def _tag_count(node) -> int:
    if isinstance(node, str):
        return 0
    return 1 + sum(_tag_count(c) for c in node.children)


def prune(node: Node, cfg: ExtractConfig) -> Node | None:
    """Tag-tree pruning: drop boilerplate subtrees, keep content.

    Rules (in order, integer arithmetic only):
    1. structural boilerplate tags → drop;
    2. class/id token blocklist → drop;
    3. containers (div/section/ul/ol/table) whose link density exceeds
       cfg.link_density_pct → drop;
    4. containers with many tags but text density below
       cfg.text_density_pct (text_chars*100 < tag_count*text_density_pct
       scaled) → drop.
    """
    if node.tag in BOILERPLATE_TAGS:
        return None
    if _is_boiler_attr(node):
        return None
    if node.tag in ("div", "section", "ul", "ol", "table", "article"):
        t, l = _text_link_chars(node)
        if t >= cfg.min_block_chars and l * 100 > t * cfg.link_density_pct:
            return None
        tags = _tag_count(node)
        # low text density: lots of markup, little text (menus, widgets)
        if tags >= 5 and t * 100 < tags * cfg.text_density_pct * 5:
            return None
    kept = []
    for c in node.children:
        if isinstance(c, str):
            kept.append(c)
        else:
            p = prune(c, cfg)
            if p is not None:
                kept.append(p)
    node.children = kept
    return node


# ------------------------------------------------------------- rendering


def _inline_md(node, out: list) -> None:
    """Render inline content into `out` (list of str pieces)."""
    if isinstance(node, str):
        out.append(node)
        return
    tag = node.tag
    if tag == "br":
        out.append(" ")
        return
    if tag == "img":
        return  # images in HTML leg: dropped (no image column in input_hint)
    if tag == "a":
        inner: list = []
        for c in node.children:
            _inline_md(c, inner)
        txt = _collapse("".join(inner))
        href = node.attrs.get("href", "")
        if txt:
            out.append(f"[{txt}]({href})")
        return
    wrap = INLINE_MD.get(tag)
    if wrap:
        inner = []
        for c in node.children:
            _inline_md(c, inner)
        txt = _collapse("".join(inner))
        if txt:
            out.append(wrap[0] + txt + wrap[1])
        return
    for c in node.children:
        _inline_md(c, out)


def _collapse(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


def _inline_text(node) -> str:
    out: list = []
    _inline_md(node, out)
    # pieces carry their own whitespace; concatenate then collapse
    return _collapse("".join(out))


def _raw_text(node) -> str:
    """Verbatim text (for <pre>): no whitespace collapsing."""
    if isinstance(node, str):
        return node
    return "".join(_raw_text(c) for c in node.children)


def _cell_text(node) -> str:
    return _inline_text(node).replace("|", "\\|")


def _render_table(node: Node, blocks: list[Block], cfg: ExtractConfig) -> None:
    rows: list[list[str]] = []
    has_header = False

    def collect_rows(n: Node) -> None:
        nonlocal has_header
        for c in n.children:
            if isinstance(c, str):
                continue
            if c.tag == "tr":
                cells = [
                    _cell_text(cc)
                    for cc in c.children
                    if not isinstance(cc, str) and cc.tag in ("td", "th")
                ]
                if cells:
                    if not rows and any(
                        not isinstance(cc, str) and cc.tag == "th" for cc in c.children
                    ):
                        has_header = True
                    rows.append(cells)
            elif c.tag in ("thead", "tbody", "tfoot", "table"):
                collect_rows(c)

    collect_rows(node)
    if not rows:
        return
    width = max(len(r) for r in rows)
    norm = [r + [""] * (width - len(r)) for r in rows]
    lines = []
    header = norm[0] if has_header else [""] * width
    body = norm[1:] if has_header else norm
    lines.append("| " + " | ".join(header) + " |")
    lines.append("| " + " | ".join(["---"] * width) + " |")
    for r in body:
        lines.append("| " + " | ".join(r) + " |")
    blocks.append(Block("table", "\n".join(lines)))


def _emit_blocks(node: Node, blocks: list[Block], cfg: ExtractConfig,
                 list_ctx: list | None = None) -> None:
    """Walk the pruned tree in document order, emitting markdown blocks."""
    pending_inline: list = []

    def flush_pending() -> None:
        if pending_inline:
            txt = _collapse(" ".join(pending_inline))
            pending_inline.clear()
            if len(txt) >= cfg.min_block_chars:
                blocks.append(Block("para", txt))

    for c in node.children:
        if isinstance(c, str):
            if c.strip():
                pending_inline.append(_collapse(c))
            continue
        tag = c.tag
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            flush_pending()
            txt = _inline_text(c)
            if txt:
                blocks.append(Block("heading", "#" * int(tag[1]) + " " + txt))
        elif tag == "p" or tag == "blockquote" or tag == "figcaption" or tag == "dd" or tag == "dt":
            flush_pending()
            txt = _inline_text(c)
            if len(txt) >= cfg.min_block_chars:
                blocks.append(Block("para", ("> " + txt) if tag == "blockquote" else txt))
        elif tag in ("ul", "ol"):
            flush_pending()
            idx = 1
            for li in c.children:
                if isinstance(li, str) or li.tag != "li":
                    continue
                txt = _inline_text(li)
                if not txt:
                    continue
                if tag == "ol":
                    blocks.append(Block("list_item", f"{idx}. {txt}"))
                    idx += 1
                else:
                    blocks.append(Block("list_item", f"- {txt}"))
        elif tag == "table":
            flush_pending()
            _render_table(c, blocks, cfg)
        elif tag == "pre":
            flush_pending()
            raw = _raw_text(c).strip("\n")
            if raw.strip():
                blocks.append(Block("code", "```\n" + raw + "\n```"))
        elif tag in ("div", "section", "article", "main", "body", "html", "figure", "dl"):
            flush_pending()
            _emit_blocks(c, blocks, cfg)
        elif tag in ("span", "a", "b", "strong", "i", "em", "code", "u", "small", "sup", "sub", "br", "img"):
            piece: list = []
            _inline_md(c, piece)
            s = _collapse("".join(piece))
            if s:
                pending_inline.append(s)
        else:
            # unknown container: recurse (content-preserving default)
            flush_pending()
            _emit_blocks(c, blocks, cfg)
    flush_pending()


# ------------------------------------------------------------- entry point


@dataclass(frozen=True)
class ExtractResult:
    ok: bool
    text_md: str
    spans: list
    error_kind: str = ""
    error: str = ""


def extract_html(raw: bytes, cfg: ExtractConfig = DEFAULT_CONFIG) -> ExtractResult:
    """bytes → (text_md, spans) for an HTML payload. Never raises."""
    try:
        text, _enc = decode_bytes(raw)
        root = parse_html(text)
        pruned = prune(root, cfg)
        blocks: list[Block] = []
        if pruned is not None:
            _emit_blocks(pruned, blocks, cfg)
        text_md, spans = render(blocks)
        return ExtractResult(True, text_md, spans)
    except Exception as e:  # noqa: BLE001 — row-level error capture (M12)
        return ExtractResult(False, "", [], "html_parse_error", str(e)[:200])
