"""Registry contract tests (mirrors reference utils/registry_test.py strategy)."""

import argparse

import pytest

from cvnets_tpu.utils.logger import LoggerError, disable_printing
from cvnets_tpu.utils.registry import Registry


def test_register_and_get():
    reg = Registry("test")

    @reg.register("foo")
    def foo():
        return 42

    assert "foo" in reg
    assert reg["foo"]() == 42


def test_key_argument_injection():
    reg = Registry("test")
    reg.register("awesome_dict")(dict)
    assert reg["awesome_dict(name=hello, type=fifo)"]() == {
        "name": "hello", "type": "fifo"
    }


def test_two_part_keys():
    reg = Registry("test")

    @reg.register("resnet", type="classification")
    class A:
        pass

    @reg.register("resnet", type="segmentation")
    class B:
        pass

    assert reg[("resnet", "classification")] is A
    assert reg[("resnet", "segmentation")] is B


def test_duplicate_rejected():
    reg = Registry("test")
    reg.register("x")(dict)
    with pytest.raises(ValueError):
        reg.register("x")(dict)


def test_base_class_enforced():
    class Base:
        pass

    reg = Registry("test", base_class=Base)
    with pytest.raises(ValueError):
        reg.register("bad")(dict)

    @reg.register("good")
    class Good(Base):
        pass


def test_unknown_key_errors():
    disable_printing()
    reg = Registry("test")
    reg.register("known")(dict)
    with pytest.raises(LoggerError):
        reg["unknown"]


def test_all_arguments():
    reg = Registry("test")

    @reg.register("with_args")
    class WithArgs:
        @classmethod
        def add_arguments(cls, parser):
            parser.add_argument("--test.flag", type=int, default=3)
            return parser

    parser = argparse.ArgumentParser()
    reg.all_arguments(parser)
    opts = parser.parse_args([])
    assert getattr(opts, "test.flag") == 3


def test_snapshot_restore_roundtrip():
    reg = Registry("snap_test")
    reg.register("keep")(dict)
    snap = reg.snapshot()
    reg.register("transient")(list)
    assert "transient" in reg
    reg.restore(snap)
    assert "keep" in reg
    assert "transient" not in reg


def test_all_registries_tracks_instances():
    from cvnets_tpu.utils.registry import all_registries

    reg = Registry("tracked_test")
    assert any(r is reg for r in all_registries())


def test_same_source_reregistration_is_idempotent_under_pytest():
    """One test file imported under two module names re-executes its register
    decorators (the 7887cc4 failure); under pytest the second execution of the
    SAME source is a no-op, while a different item stays a hard error."""
    reg = Registry("dup_test")

    class Thing:
        pass

    reg.register("thing")(Thing)
    # same qualname + same file: allowed (returns the item unchanged)
    assert reg.register("thing")(Thing) is Thing

    class Other:
        pass

    with pytest.raises(ValueError, match="duplicate"):
        reg.register("thing")(Other)
