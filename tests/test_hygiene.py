"""Code-hygiene checks (the reference's only automated tests are ament
flake8/pep257 linters — SURVEY.md §4; without flake8 in this image, this
enforces the basics: everything compiles, no tabs, no trailing whitespace in
package sources)."""
import pathlib
import py_compile

PKG = pathlib.Path(__file__).resolve().parent.parent / "opticalflowcontainer_tpu"


def test_all_sources_compile():
    for f in PKG.rglob("*.py"):
        py_compile.compile(str(f), doraise=True)


def test_no_tabs_or_trailing_whitespace():
    offenders = []
    for f in PKG.rglob("*.py"):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if "\t" in line:
                offenders.append(f"{f.name}:{i} tab")
            elif line != line.rstrip():
                offenders.append(f"{f.name}:{i} trailing ws")
    assert not offenders, offenders[:10]
