"""Build the static HTML documentation site from the ``docs/`` tree.

The reference builds a Documenter+Vitepress HTML site with
``@autodocs``-generated API pages (reference docs/make.jl:46-85,
docs/src/api.md:5-7). This repo's analog: every executed-markdown page in
``docs/`` (the CI doc-runner executes their python blocks) plus the
generated ``api_reference.md`` (tools/gen_api_reference.py, drift-checked
in CI) is rendered to a navigable static site with the reference's
get-started / tutorials / research / api navigation structure. Zero extra
dependencies: python-markdown + pygments (both baked in) — no
mkdocs/sphinx in this image.

Usage: python tools/build_docs_site.py [outdir]   (default docs/_site)
Exit 0 on success; any missing nav page is a hard error so the nav can't
rot silently.
"""

import pathlib
import posixpath
import re
import sys

import markdown
from pygments.formatters import HtmlFormatter

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOCS = ROOT / "docs"

#: nav mirrors the reference's site structure (make.jl pages= list):
#: Home/get-started → tutorials → research showcase → API. Section →
#: [(title, repo-relative md path)].
NAV = [
    ("Getting started", [
        ("Home", "README.md"),
        ("Get started", "docs/get_started.md"),
    ]),
    ("Tutorials", [
        ("Overview", "docs/tutorials/overview.md"),
        ("Custom hybrid models", "docs/tutorials/custom_models.md"),
        ("Losses", "docs/tutorials/losses.md"),
        ("Sequences & LSTM", "docs/tutorials/sequences_lstm.md"),
        ("Second-order solvers", "docs/tutorials/second_order.md"),
        ("Hyperparameter tuning", "docs/tutorials/hyperparameter_tuning.md"),
        ("Scaling on TPU", "docs/tutorials/scaling_tpu.md"),
        ("Cluster jobs", "docs/tutorials/cluster_jobs.md"),
    ]),
    ("Research", [
        ("Overview", "docs/research/overview.md"),
        ("Synthetic respiration study",
         "docs/research/synthetic_respiration.md"),
    ]),
    ("Performance", [
        ("TPU notes", "docs/tpu_notes.md"),
        ("Baselines & benchmarks", "BASELINE.md"),
    ]),
    ("API", [
        ("API overview", "docs/api.md"),
        ("API reference (generated)", "docs/api_reference.md"),
    ]),
]

CSS = """
:root { --fg:#1a1a1a; --bg:#ffffff; --accent:#0b6e4f; --side:#f5f5f2;
        --border:#e2e2dd; --code:#f6f8fa; }
* { box-sizing: border-box; }
body { margin:0; font:16px/1.6 -apple-system,'Segoe UI',Roboto,sans-serif;
       color:var(--fg); background:var(--bg); }
.layout { display:flex; min-height:100vh; }
nav.side { width:270px; flex:none; background:var(--side);
           border-right:1px solid var(--border); padding:1.2rem 1rem;
           position:sticky; top:0; height:100vh; overflow-y:auto; }
nav.side h1 { font-size:1.05rem; margin:0 0 1rem; }
nav.side h2 { font-size:.78rem; text-transform:uppercase;
              letter-spacing:.06em; color:#666; margin:1.1rem 0 .3rem; }
nav.side a { display:block; padding:.18rem .4rem; border-radius:4px;
             color:var(--fg); text-decoration:none; font-size:.92rem; }
nav.side a:hover { background:#ebebe5; }
nav.side a.active { background:var(--accent); color:#fff; }
main { flex:1; min-width:0; padding:2rem 3rem; max-width:62rem; }
main h1,main h2,main h3 { line-height:1.25; }
main h1 { border-bottom:1px solid var(--border); padding-bottom:.3rem; }
main a { color:var(--accent); }
pre { background:var(--code); border:1px solid var(--border);
      border-radius:6px; padding: .8rem 1rem; overflow-x:auto;
      font-size:.86rem; line-height:1.45; }
code { font-family:ui-monospace,'SF Mono',Menlo,Consolas,monospace;
       font-size:.88em; background:var(--code); border-radius:3px;
       padding:.08em .3em; }
pre code { background:none; padding:0; }
table { border-collapse:collapse; display:block; overflow-x:auto;
        font-size:.9rem; }
th,td { border:1px solid var(--border); padding:.35rem .6rem;
        text-align:left; vertical-align:top; }
th { background:var(--side); }
blockquote { border-left:3px solid var(--accent); margin-left:0;
             padding-left:1rem; color:#444; }
@media (max-width: 880px) { .layout{flex-direction:column}
  nav.side{width:100%;height:auto;position:static} main{padding:1rem} }
"""

PAGE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — easyhybrid_tpu</title>
<link rel="stylesheet" href="{root}style.css">
<link rel="stylesheet" href="{root}pygments.css">
</head><body><div class="layout">
<nav class="side"><h1><a href="{root}index.html"
  style="color:inherit">easyhybrid_tpu</a></h1>
{nav}
</nav>
<main>
{body}
</main>
</div></body></html>
"""


def out_name(md_path: str) -> str:
    """Repo-relative md path → flat site html name."""
    p = md_path.replace("docs/", "").replace("/", "_")
    p = p[:-3] + ".html"
    return "index.html" if p == "README.html" else p


def build_nav(active_md: str) -> str:
    parts = []
    for section, pages in NAV:
        parts.append(f"<h2>{section}</h2>")
        for title, md in pages:
            cls = ' class="active"' if md == active_md else ""
            parts.append(f'<a href="{out_name(md)}"{cls}>{title}</a>')
    return "\n".join(parts)


_LINK_RE = re.compile(r'href="([^"#:]+\.md)(#[^"]*)?"')


def rewrite_links(html: str, known: dict, src_rel: str) -> str:
    """Relative .md links → their site html names (unknown ones keep the
    md target so they still work on the repo host). Targets resolve
    against the SOURCE page's directory first — pages sharing a basename
    (tutorials/overview.md vs research/overview.md) must not collide."""
    src_dir = posixpath.dirname(src_rel)

    def sub(m):
        target, frag = m.group(1), m.group(2) or ""
        for cand in (
            posixpath.normpath(posixpath.join(src_dir, target)),
            posixpath.normpath(target),  # repo-root-relative links
        ):
            if cand in known:
                return f'href="{out_name(cand)}{frag}"'
        # last resort: a basename that is UNIQUE across the nav
        base = target.split("/")[-1]
        hits = [md for md in known if md.split("/")[-1] == base]
        if len(hits) == 1:
            return f'href="{out_name(hits[0])}{frag}"'
        return m.group(0)

    return _LINK_RE.sub(sub, html)


def main() -> int:
    outdir = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else (
        DOCS / "_site"
    )
    outdir.mkdir(parents=True, exist_ok=True)
    md = markdown.Markdown(
        extensions=[
            "fenced_code", "codehilite", "tables", "toc", "sane_lists",
        ],
        extension_configs={
            "codehilite": {"guess_lang": False, "noclasses": False},
        },
    )
    known = {p: t for _, pages in NAV for t, p in pages}
    n = 0
    for section, pages in NAV:
        for title, rel in pages:
            src = ROOT / rel
            if not src.exists():
                print(f"ERROR: nav page missing: {rel}", file=sys.stderr)
                return 1
            md.reset()
            body = md.convert(src.read_text())
            body = rewrite_links(body, known, rel)
            html = PAGE.format(
                title=title, body=body, nav=build_nav(rel), root="",
            )
            (outdir / out_name(rel)).write_text(html)
            n += 1
    (outdir / "style.css").write_text(CSS)
    (outdir / "pygments.css").write_text(
        HtmlFormatter(style="default").get_style_defs(".codehilite")
    )
    print(f"built {n} pages -> {outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
