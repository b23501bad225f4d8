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
