"""Model registry: name -> (dataset loader, model class).

Mirrors the reference's pairing contract at ``main.py:16-22`` — each model
assumes feature bundles its paired dataset loader precomputed.  Loaders
return an ``InteractionData`` (optionally extended with text features), and
model classes consume it.
"""

from __future__ import annotations

from .config import Config


def get_class(name: str):
    from .data.core import load_interactions
    from .data.text import load_ltr_data
    from .models.adv_sampling import AdvSamplModel
    from .models.lightgcn import LightGCN
    from .models.ltr import LTRLinear, LTRLinearWPop
    from .models.conv import ConvModel
    from .models.ltr_concat import LTRCosine, LTRSimple
    from .models.ltr_boosted import (LTRGradientBoosted,
                                     LTRGradientBoostedWPop,
                                     MarcusGradientBoosted)
    from .models.text_loss import (TextModel, TextModelKG,
                                   TextModelReviews)

    def base_loader(cfg: Config):
        return load_interactions(cfg.data, reshuffle=cfg.reshuffle,
                                 seed=cfg.seed)

    registry = {
        'lgcn': (base_loader, LightGCN),
        'adv_sampling': (base_loader, AdvSamplModel),
        'ltr_linear': (load_ltr_data, LTRLinear),
        'ltr_pop': (load_ltr_data, LTRLinearWPop),
        'text': (load_ltr_data, TextModel),
        'kg': (load_ltr_data, TextModelKG),
        'reviews': (load_ltr_data, TextModelReviews),
        'text_probe': (load_ltr_data, LightGCN),  # probe runs in cli
        'xgboost': (load_ltr_data, LTRGradientBoosted),
        'gbdt': (load_ltr_data, LTRGradientBoosted),
        'xgboost_pop': (load_ltr_data, LTRGradientBoostedWPop),
        'gbdt_pop': (load_ltr_data, LTRGradientBoostedWPop),
        'marcus': (load_ltr_data, MarcusGradientBoosted),
        'ltr_reviews': (load_ltr_data, LTRCosine),
        'ltr_kg': (load_ltr_data, LTRCosine),
        'ltr_simple': (load_ltr_data, LTRSimple),  # probe runs in cli
        'gcn': (base_loader, ConvModel),
        'graphsage': (base_loader, ConvModel),
        'gat': (base_loader, ConvModel),
        'gatv2': (base_loader, ConvModel),
    }
    return registry[name]


BOOSTED_MODELS = ('xgboost', 'gbdt', 'xgboost_pop', 'gbdt_pop', 'marcus')
