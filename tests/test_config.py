import pathlib

from onedc_tpu.config import Config, instantiate, load_config, merge, parse_cli_overrides


def test_merge_cli_wins(tmp_path: pathlib.Path):
    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nnested:\n  x: 2\n  y: [1, 2]\nname: foo\n")
    cfg = load_config(str(p), ["nested.x=5", "new.key=hello", "a=2.5"])
    assert cfg.a == 2.5
    assert cfg.nested.x == 5
    assert cfg.nested.y == [1, 2]
    assert cfg.new.key == "hello"
    assert cfg.name == "foo"


def test_parse_types():
    cfg = parse_cli_overrides(["a=true", "b=null", "c=[1,2]", "d=1e-4"])
    assert cfg.a is True and cfg.b is None
    assert cfg.c == [1, 2] and cfg.d == 1e-4


def test_instantiate():
    spec = {"target": "collections.OrderedDict", "params": {}}
    obj = instantiate(spec)
    assert type(obj).__name__ == "OrderedDict"


def test_merge_deep():
    out = merge(Config.wrap({"a": {"b": 1, "c": 2}}), {"a": {"b": 9}})
    assert out.a.b == 9 and out.a.c == 2
