"""Driver-contract invariants for __spark_entry__: no silently-overridden
duplicate keys (a dict literal keeps only the last), every oracle key has
a query, and the registries import cleanly."""

import ast


def _literal_dict_keys(path: str, func_name: str) -> list[str]:
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            for sub in ast.walk(node):
                if not isinstance(sub, ast.Return):
                    continue
                val = sub.value
                # `return {...}` or `return _wrapper({...})` (the sample-
                # priority reorder wraps the literal in a call)
                if isinstance(val, ast.Call) and val.args \
                        and isinstance(val.args[0], ast.Dict):
                    val = val.args[0]
                if isinstance(val, ast.Dict):
                    return [k.value for k in val.keys
                            if isinstance(k, ast.Constant)]
    raise AssertionError(f"no dict-literal return found in {func_name}")


def test_no_duplicate_registry_keys():
    path = "__spark_entry__.py"
    for fn in ("queries", "oracle_sql"):
        keys = _literal_dict_keys(path, fn)
        dupes = {k for k in keys if keys.count(k) > 1}
        assert not dupes, f"{fn}() has silently-overridden duplicate keys: {dupes}"


def test_every_oracle_has_a_query():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs), set(os_) - set(qs)
    # and the query set is the documented size or larger
    assert len(qs) >= 100
