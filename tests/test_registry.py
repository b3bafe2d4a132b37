"""Registry completeness: every CLI model choice resolves and pairs with a
loader (the reference's parser lists names its main.py cannot resolve —
SURVEY.md Q3; here the surfaces must match)."""

from textgcn_tpu.config import MODEL_CHOICES
from textgcn_tpu.registry import BOOSTED_MODELS, get_class


def test_every_choice_resolves():
    for name in MODEL_CHOICES:
        loader, model_cls = get_class(name)
        assert callable(loader) and model_cls is not None, name


def test_boosted_names_are_choices():
    for name in BOOSTED_MODELS:
        assert name in MODEL_CHOICES


def test_plan_tile_blocks_properties():
    from textgcn_tpu.ops.pallas_spmm import plan_tile_blocks
    for args in ((60, 512, 512), (600_000, 25_000, 60_000),
                 (2_000_000, 200_000, 80_000)):
        s, d = plan_tile_blocks(*args)
        assert s in (512, 1024, 2048, 4096)
        assert d in (512, 1024, 2048, 4096)
