"""Config system tests: target/params instantiation + base_config merging.

Mirrors the reference config semantics (enhancing/utils/general.py:29-76).
"""
import textwrap

from enhancing_tpu.utils.config import (
    get_obj_from_str,
    initialize_from_config,
    load_config,
    merge_configs,
)


class Dummy:
    def __init__(self, a=1, b=2):
        self.a, self.b = a, b


def test_get_obj_from_str():
    from enhancing_tpu.utils.config import ConfigDict
    assert get_obj_from_str("enhancing_tpu.utils.config.ConfigDict") is ConfigDict
    assert get_obj_from_str("tests.test_config.Dummy").__qualname__ == "Dummy"


def test_initialize_from_config():
    obj = initialize_from_config(
        {"target": "tests.test_config.Dummy", "params": {"a": 10}})
    assert type(obj).__qualname__ == "Dummy"
    assert obj.a == 10 and obj.b == 2


def test_initialize_extra_kwargs():
    obj = initialize_from_config({"target": "tests.test_config.Dummy"}, b=7)
    assert obj.b == 7


def test_load_and_merge(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(textwrap.dedent("""
        model:
          target: tests.test_config.Dummy
          params: {a: 1, b: 2}
        lr: 0.1
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent(f"""
        base_config: {base}
        model:
          params: {{a: 5}}
    """))
    cfg = load_config(child)
    assert cfg.lr == 0.1
    assert cfg.model.params.a == 5
    assert cfg.model.params.b == 2
    obj = initialize_from_config(cfg.model)
    assert obj.a == 5


def test_merge_lists_replace():
    out = merge_configs({"x": [1, 2]}, {"x": [3]})
    assert out["x"] == [3]


def test_attribute_access_nested():
    cfg = merge_configs({"a": {"b": {"c": 3}}}, {})
    assert cfg.a.b.c == 3


def test_reference_config_schema_loads():
    """The shipped reference-style configs parse and expose expected fields."""
    cfg = load_config("configs/imagenet_vitvq_small.yaml")
    assert cfg.model.params.encoder.dim == 512
    assert cfg.model.params.quantizer.n_embed == 8192


def test_nested_mutation_sticks():
    """Regression: ConfigDict.__getitem__ used to wrap nested plain dicts
    into shallow copies, so main.py's `-a` mutation
    (config.model["params"]["dtype"] = "bfloat16") never reached the
    model. Nested writes must survive re-access."""
    from enhancing_tpu.utils.config import ConfigDict

    c = ConfigDict({"model": {"params": {"encoder": {"dim": 64}}}})
    c.model["params"]["dtype"] = "bfloat16"
    assert c.model["params"].get("dtype") == "bfloat16"
    assert c["model"]["params"]["dtype"] == "bfloat16"
    c.model["params"].setdefault("loss", {}).setdefault(
        "params", {})["disc_params"] = {"dtype": "bfloat16"}
    assert c.model["params"]["loss"]["params"]["disc_params"]["dtype"] \
        == "bfloat16"
    # to_dict unwraps the in-place wrappers back to plain dicts
    d = c.to_dict()
    assert type(d["model"]["params"]) is dict
    assert d["model"]["params"]["dtype"] == "bfloat16"
