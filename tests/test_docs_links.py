"""Docs/CI guard tier (reference tests/test_markdown_relative_links.py role):
every relative link/path reference in the repo's markdown must resolve."""

import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MD_FILES = []
for base in ("", "docs", "runtime/clients"):
    d = os.path.join(ROOT, base)
    if os.path.isdir(d):
        MD_FILES += [os.path.join(d, f) for f in os.listdir(d)
                     if f.endswith(".md")]

LINK = re.compile(r"\[[^\]]*\]\(([^)#\s]+)(?:#[^)]*)?\)")


@pytest.mark.parametrize("md", MD_FILES, ids=lambda p: os.path.relpath(p, ROOT))
def test_relative_links_resolve(md):
    text = open(md, encoding="utf-8").read()
    base = os.path.dirname(md)
    for target in LINK.findall(text):
        if target.startswith(("http://", "https://", "mailto:")):
            continue
        path = os.path.normpath(os.path.join(base, target))
        assert os.path.exists(path), f"{os.path.relpath(md, ROOT)} -> {target}"
