"""Frontier-parallel repo tree walk (S9/S10) driven by an in-memory tree —
the injected lister/reader is the seam where the Git API client plugs in.

The tree/lister live inside a factory so cloudpickle ships them by value to
executors (a pytest module isn't importable on Spark workers).
"""

from __future__ import annotations

from pii_detector_spark.sources.repo_walker import (
    as_web_pages,
    fetch_repo_files,
    walk_repo_tree,
)


def _fake_repo():
    tree = {
        "": [
            {"path": "README.md", "kind": "file", "etag": "e1", "size": 10},
            {"path": "src", "kind": "dir"},
            {"path": "docs", "kind": "dir"},
        ],
        "src": [
            {"path": "src/main.py", "kind": "file", "etag": "e2", "size": 20},
            {"path": "src/sub", "kind": "dir"},
        ],
        "src/sub": [
            {"path": "src/sub/util.py", "kind": "file", "etag": "e3", "size": 30},
        ],
        "docs": [
            {"path": "docs/guide.txt", "kind": "file", "etag": "e4", "size": 40},
        ],
    }

    def list_dir(path: str):
        return tree.get(path, [])

    def read_file(path: str):
        return f"content of {path}".encode()

    return list_dir, read_file


def test_walk_finds_all_files_across_levels(spark):
    list_dir, _ = _fake_repo()
    files = walk_repo_tree(spark, list_dir)
    got = {(r["path"], r["etag"], r["size"]) for r in files.collect()}
    assert got == {
        ("README.md", "e1", 10),
        ("src/main.py", "e2", 20),
        ("src/sub/util.py", "e3", 30),
        ("docs/guide.txt", "e4", 40),
    }


def test_walk_respects_max_depth(spark):
    list_dir, _ = _fake_repo()
    files = walk_repo_tree(spark, list_dir, max_depth=2)
    got = {r["path"] for r in files.collect()}
    # depth 1 = root listing, depth 2 = src/docs listings; src/sub never
    # expanded
    assert got == {"README.md", "src/main.py", "docs/guide.txt"}


def test_walk_empty_tree(spark):
    def empty(_path: str):
        return []

    files = walk_repo_tree(spark, empty)
    assert files.count() == 0


def test_fetch_maps_to_web_pages_shape(spark):
    list_dir, read_file = _fake_repo()
    files = walk_repo_tree(spark, list_dir)
    fetched = fetch_repo_files(files, read_file, url_prefix="gh://owner/repo/")
    rows = {r["url"]: r for r in fetched.collect()}
    assert rows["gh://owner/repo/src/main.py"]["payload"] == b"content of src/main.py"
    web = as_web_pages(fetched)
    assert web.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert web.count() == 4
    # payload rides as html bytes, extractable downstream
    r = {x["url"]: x for x in web.collect()}
    assert bytes(r["gh://owner/repo/README.md"]["html"]) == b"content of README.md"


def test_walk_leaves_no_cached_relations(spark):
    """One job per level, nothing persisted after return (a cached-level
    design leaked one relation per tree depth)."""
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()  # other ops may cache by design
    list_dir, _ = _fake_repo()
    files = walk_repo_tree(spark, list_dir)
    assert files.count() == 4
    assert jsc.getPersistentRDDs().size() == before
