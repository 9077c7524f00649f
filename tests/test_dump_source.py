"""S1 dump source: bz2 text read + redirect extraction vs a faithful Python
replica of the reference's stateful loop (extract_redirects.py:28-51)."""

import bz2
import re


def _reference_loop(raw: str) -> dict:
    """Line-by-line replica of the reference's extraction semantics."""
    opening, closing = re.compile(r"\[\["), re.compile(r"]]")
    redirects, title = {}, None
    for line in raw.splitlines():
        line = line.strip()
        if line.startswith("<title>"):
            t = line[len("<title>"):]
            if t.endswith("</title>"):
                t = t[: -len("</title>")]
            title = t
        else:
            idx = line.lower().find("#redirect")
            if idx >= 0 and title is not None:
                start = opening.search(line, pos=idx + len("#REDIRECT"))
                if start:
                    end = closing.search(line, pos=start.end())
                    if end:
                        redirects[title] = line[start.end():end.start()].replace("_", " ")
    return redirects


def _page(title: str, body: str) -> str:
    return f"  <page>\n    <title>{title}</title>\n    <text>{body}</text>\n  </page>\n"


DUMP = "<mediawiki>\n" + "".join(
    [
        _page("Alan Turing", "Alan Mathison Turing was a mathematician."),
        _page("A. Turing", "#REDIRECT [[Alan Turing]]"),
        _page("Turing, Alan", "#Redirect [[Alan_Turing]]"),          # mixed case + underscore
        _page("AT", "some prose\n#REDIRECT [[Alan Turing#Early life]]"),  # anchor kept
        _page("Not a redirect", "mentions #REDIRECT in prose only"),  # no [[...]] -> dropped
        _page("Pipe", "#REDIRECT [[Alan Turing|the father of CS]]"),  # pipe kept (ref behavior)
    ]
) + "</mediawiki>\n"


def test_redirects_from_bz2_dump(spark, tmp_path):
    p = tmp_path / "chunk.xml.bz2"
    p.write_bytes(bz2.compress(DUMP.encode()))
    from wiki_entity_linker_spark.sources.dump import redirects_from_dump

    got = {r["title"]: r["target"] for r in redirects_from_dump(spark, str(p)).collect()}
    exp = _reference_loop(DUMP)
    assert exp == {
        "A. Turing": "Alan Turing",
        "Turing, Alan": "Alan Turing",
        "AT": "Alan Turing#Early life",
        "Pipe": "Alan Turing|the father of CS",
    }
    assert got == exp


def test_dump_pages_split(spark, tmp_path):
    p = tmp_path / "chunk.xml"
    p.write_text(DUMP)
    from wiki_entity_linker_spark.sources.dump import read_dump_pages

    pages = read_dump_pages(spark, str(p))
    assert pages.count() == 6  # one row per <page>, header/footer filtered
