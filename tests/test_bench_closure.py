"""The bench floor `_libsrc` stamp (bench.lib_closure) is load-bearing:
if the closure silently loses modules, library rewrites stop
re-baselining floors and the r10 stale-floor class of bug returns.
Pin the closure's membership for representative slots across the
import styles it must handle (function-level imports in entry
callables, helper-function indirection, closure cells, relative and
function-level imports inside package modules)."""

import bench
import __spark_entry__ as entrymod

PKG = "time_series_loader_spark"


def _mods(fn):
    mods, helpers = bench.lib_closure(fn)
    return set(mods), helpers


def test_closure_sees_function_level_entry_imports():
    # q_minhash_lsh imports dedup + graph INSIDE the function body
    mods, _ = _mods(entrymod.queries()["minhash_lsh"])
    assert f"{PKG}.operators.dedup" in mods
    assert f"{PKG}.operators.graph" in mods  # via dedup's own lazy import too


def test_closure_follows_entry_helper_indirection():
    # dedup_incremental reaches doc_signatures only through the
    # _dedup_store helper; the helper's source must also feed the hash
    mods, helpers = _mods(entrymod.queries()["dedup_incremental"])
    assert f"{PKG}.operators.dedup" in mods
    assert f"{PKG}.operators.spans" in mods
    assert any("_DEDUP_STORES" in h for h in helpers), (
        "helper sources must include _dedup_store's body"
    )


def test_closure_transits_package_relative_imports():
    # corpus_prep -> chunking -> (relative, function-level)
    # ..functions.bpe; losing that edge re-opens the r9/r10 BPE hole
    mods, _ = _mods(entrymod.queries()["corpus_prep"])
    assert f"{PKG}.operators.chunking" in mods
    assert f"{PKG}.functions.bpe" in mods


def test_closure_is_tight_not_whole_package():
    # precision matters: if every slot's closure were the whole package,
    # every floor would re-baseline every round and the ratchet dies
    mods, _ = _mods(entrymod.queries()["text_profile"])
    assert f"{PKG}.operators.text" in mods
    assert f"{PKG}.operators.dedup" not in mods
    assert f"{PKG}.streaming.ingest" not in mods


def test_closure_sees_closure_cells():
    # bench_sections' inner defs may close over package objects
    mods, _ = _mods(entrymod.bench_sections()["minhash_lsh/verified"])
    assert f"{PKG}.operators.dedup" in mods


def test_lib_hash_is_deterministic_and_content_sensitive(tmp_path):
    fn = entrymod.queries()["minhash_lsh"]
    h1 = bench.lib_hash(fn)
    h2 = bench.lib_hash(fn)
    assert h1 == h2
    # sensitivity is via file sha: simulate by checking the hash uses
    # the dedup module file's bytes (cache primed with a fake entry)
    path = bench._pkg_module_file(f"{PKG}.operators.dedup")
    real = bench._file_hash(path)
    try:
        bench._file_sha[path] = "0" * 12
        assert bench.lib_hash(fn) != h1
    finally:
        bench._file_sha[path] = real
