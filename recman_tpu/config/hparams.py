"""Hyperparameter/config system (reference recman/tf/hparams/).

Same surface as the reference: ``HParam`` named-value wrappers, a dict-like
registry with ``add_param`` and a ``grid_search()`` cartesian-product
generator (BaseHyperParameters.py:67-100), and per-model subclasses that
declare the full config surface with the reference defaults
(hparams/xDeepFM.py:20-34). No TensorBoard hparams-plugin dependency; the
observability module exports the grid separately.
"""

from __future__ import annotations

import itertools


class HParam:
    """Named parameter with a default and a discrete search domain
    (reference BaseHyperParameters.py:5-64)."""

    def __init__(self, name, default_value):
        assert name
        self._name = name
        self._default_value = default_value
        self._domain = [default_value]

    def __call__(self, domain=None):
        """Set the search domain; None resets to [default]."""
        self._domain = list(domain) if domain is not None else [self._default_value]
        return self

    @property
    def name(self):
        return self._name

    @property
    def hp_domain(self):
        return list(self._domain)

    @property
    def default_value(self):
        return self._default_value

    @property
    def advanced_dtype(self):
        """True when values aren't TB-plugin primitives (reference
        BaseHyperParameters.py:41-48) — stringified on export."""
        return not all(isinstance(v, (bool, int, float, str)) for v in self._domain)


class BaseHyperParameters(dict):
    """Registry of HParams; grid_search yields plain {name: value} dicts
    (reference BaseHyperParameters.py:67-100)."""

    LearningRate = "learning_rate"
    Optimizer = "optimizer"

    def __init__(self):
        super().__init__()
        self.add_param(self.LearningRate, 0.001)
        self.add_param(self.Optimizer, "adam")

    def add_param(self, name, default_val):
        self[name] = HParam(name, default_val)()

    def defaults(self) -> dict:
        return {name: p.default_value for name, p in self.items()}

    def grid_search(self, print_hp=False):
        domains = [[(p.name, v) for v in p.hp_domain] for p in self.values()]
        for bag in itertools.product(*domains):
            d = dict(bag)
            if print_hp:
                print(d)
            yield d


class xDeepFMHyperParams(BaseHyperParameters):
    """Full xDeepFM config surface with reference defaults
    (reference hparams/xDeepFM.py:5-34)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"
    CinCrossLayerUnits = "cin_cross_layer_units"
    CinDropOut = "cin_dropout"
    CinActivation = "cin_activation"
    CinL2Reg = "cin_l2_reg"
    CinComputeDtype = "cin_compute_dtype"
    CinRemat = "cin_remat"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.DeepHiddenUnits, (32, 32))
        self.add_param(self.DeepDropOut, (0.8, 0.8, 0.8))
        self.add_param(self.DeepActivation, "leaky_relu")
        self.add_param(self.DeepL2Reg, 0.00001)
        self.add_param(self.CinCrossLayerUnits, (100, 100, 100))
        self.add_param(self.CinDropOut, (1, 1, 1, 1))
        self.add_param(self.CinActivation, "leaky_relu")
        self.add_param(self.CinL2Reg, 0.00001)
        self.add_param(self.CinComputeDtype, "bfloat16")
        self.add_param(self.CinRemat, False)


class FMHyperParams(BaseHyperParameters):
    """FM config (capability spec from the stale reference FM.py:48-57)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    FMDropOut = "fm_dropout"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.FMDropOut, (1.0, 1.0))


class DeepFMHyperParams(BaseHyperParameters):
    """DeepFM config (capability spec from the stale reference DeepFM.py:24-90)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    FMDropOut = "fm_dropout"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"
    UseFM = "use_fm"
    UseDeep = "use_deep"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.FMDropOut, (1.0, 1.0))
        self.add_param(self.DeepHiddenUnits, (32, 32))
        self.add_param(self.DeepDropOut, (0.8, 0.8, 0.8))
        self.add_param(self.DeepActivation, "relu")
        self.add_param(self.DeepL2Reg, 0.00001)
        self.add_param(self.UseFM, True)
        self.add_param(self.UseDeep, True)


class DCNHyperParams(BaseHyperParameters):
    """DCN config (capability spec from the stale reference DCN.py:28-77)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    UseLinear = "use_linear"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"
    CrossLayerNum = "cross_layer_num"
    CrossLayerL2Reg = "cross_layer_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.UseLinear, True)
        self.add_param(self.DeepHiddenUnits, (32, 32))
        self.add_param(self.DeepDropOut, (0.6, 0.6, 0.6))
        self.add_param(self.DeepActivation, "relu")
        self.add_param(self.DeepL2Reg, 0.0)
        self.add_param(self.CrossLayerNum, 3)
        self.add_param(self.CrossLayerL2Reg, 0.0)


class DCNv2HyperParams(BaseHyperParameters):
    """DCN-V2 config (arXiv:2008.13535; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    UseLinear = "use_linear"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"
    CrossLayerNum = "cross_layer_num"
    CrossLayerL2Reg = "cross_layer_l2_reg"
    CrossRank = "cross_rank"  # None = full-rank (d, d) layers
    CrossNumExperts = "cross_num_experts"  # >1 = mixture of low-rank experts
    CrossGated = "cross_gated"  # True = GDCN information gate (2311.04635)
    Structure = "structure"  # "stacked" | "parallel"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.UseLinear, True)
        self.add_param(self.DeepHiddenUnits, (32, 32))
        self.add_param(self.DeepDropOut, (1.0, 1.0, 1.0))
        self.add_param(self.DeepActivation, "relu")
        self.add_param(self.DeepL2Reg, 0.0)
        self.add_param(self.CrossLayerNum, 3)
        self.add_param(self.CrossLayerL2Reg, 0.0)
        self.add_param(self.CrossRank, None)
        self.add_param(self.CrossNumExperts, 1)
        self.add_param(self.CrossGated, False)
        self.add_param(self.Structure, "parallel")


class AutoIntHyperParams(BaseHyperParameters):
    """AutoInt config (arXiv:1810.11921; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    UseLinear = "use_linear"
    AttLayerNum = "att_layer_num"
    AttHeadNum = "att_head_num"
    AttHeadSize = "att_head_size"
    AttUseResidual = "att_use_residual"
    AttL2Reg = "att_l2_reg"
    AttDropOut = "att_dropout"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.UseLinear, True)
        self.add_param(self.AttLayerNum, 3)
        self.add_param(self.AttHeadNum, 2)
        self.add_param(self.AttHeadSize, 8)
        self.add_param(self.AttUseResidual, True)
        self.add_param(self.AttL2Reg, 0.0)
        self.add_param(self.AttDropOut, 1.0)


class WideDeepHyperParams(BaseHyperParameters):
    """Wide&Deep config (arXiv:1606.07792; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.DeepHiddenUnits, (32, 32))
        self.add_param(self.DeepDropOut, (0.8, 0.8, 0.8))
        self.add_param(self.DeepActivation, "relu")
        self.add_param(self.DeepL2Reg, 0.00001)


class NFMHyperParams(BaseHyperParameters):
    """NFM config (arXiv:1708.05027; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    BiDropOut = "bi_dropout"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.BiDropOut, 1.0)
        self.add_param(self.DeepHiddenUnits, (32, 32))
        self.add_param(self.DeepDropOut, (0.8, 0.8, 0.8))
        self.add_param(self.DeepActivation, "relu")
        self.add_param(self.DeepL2Reg, 0.00001)


class PNNHyperParams(BaseHyperParameters):
    """PNN config (arXiv:1611.00144; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    ProductType = "product_type"  # "inner" | "outer" | "both"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.ProductType, "inner")
        self.add_param(self.DeepHiddenUnits, (32, 32))
        self.add_param(self.DeepDropOut, (0.8, 0.8, 0.8))
        self.add_param(self.DeepActivation, "relu")
        self.add_param(self.DeepL2Reg, 0.00001)


class FiBiNETHyperParams(BaseHyperParameters):
    """FiBiNET config (arXiv:1905.09433; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    BilinearType = "bilinear_type"  # "all" | "each" | "interaction"
    ReductionRatio = "reduction_ratio"
    SENETL2Reg = "senet_l2_reg"
    BilinearL2Reg = "bilinear_l2_reg"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.BilinearType, "all")
        self.add_param(self.ReductionRatio, 3)
        self.add_param(self.SENETL2Reg, 0.0)
        self.add_param(self.BilinearL2Reg, 0.0)
        self.add_param(self.DeepHiddenUnits, (32, 32))
        self.add_param(self.DeepDropOut, (0.8, 0.8, 0.8))
        self.add_param(self.DeepActivation, "relu")
        self.add_param(self.DeepL2Reg, 0.00001)


class DLRMHyperParams(BaseHyperParameters):
    """DLRM config (arXiv:1906.00091; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    BotHiddenUnits = "bot_hidden_units"
    BotActivation = "bot_activation"
    BotL2Reg = "bot_l2_reg"
    TopHiddenUnits = "top_hidden_units"
    TopDropOut = "top_dropout"
    TopActivation = "top_activation"
    TopL2Reg = "top_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.BotHiddenUnits, (32,))
        self.add_param(self.BotActivation, "relu")
        self.add_param(self.BotL2Reg, 0.00001)
        self.add_param(self.TopHiddenUnits, (32, 32))
        self.add_param(self.TopDropOut, (1.0, 1.0, 1.0))
        self.add_param(self.TopActivation, "relu")
        self.add_param(self.TopL2Reg, 0.00001)


class FwFMHyperParams(BaseHyperParameters):
    """FwFM config (arXiv:1806.03514; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    FieldWeightL2Reg = "field_weight_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.FieldWeightL2Reg, 0.0)


class AFMHyperParams(BaseHyperParameters):
    """AFM config (capability spec from the stale reference AFM.py:20-60)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    LinearL2Reg = "linear_l2_reg"
    LinearFeatures = "linear_features"
    AttFactor = "att_factor"
    AttDropOut = "att_dropout"
    AttL2Reg = "att_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.LinearL2Reg, 0.00001)
        self.add_param(self.LinearFeatures, ())
        self.add_param(self.AttFactor, 4)
        self.add_param(self.AttDropOut, 1.0)
        self.add_param(self.AttL2Reg, 0.0)


class DINHyperParams(BaseHyperParameters):
    """DIN config (capability spec from the incomplete reference DIN.py:20-60)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    AttHiddenUnits = "att_hidden_units"
    AttActivation = "att_activation"
    AttWeightNormalization = "att_weight_normalization"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.AttHiddenUnits, (80, 40))
        self.add_param(self.AttActivation, "dice")
        self.add_param(self.AttWeightNormalization, False)
        self.add_param(self.DeepHiddenUnits, (80, 40))
        self.add_param(self.DeepDropOut, (1.0, 1.0, 1.0))
        self.add_param(self.DeepActivation, "dice")
        self.add_param(self.DeepL2Reg, 0.00001)


class DIENHyperParams(BaseHyperParameters):
    """DIEN config (arXiv:1809.03672; completes the reference's gestured
    sequence family, DIN.py:98-108)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    GruHidden = "gru_hidden"  # None -> embedding_size
    GruL2Reg = "gru_l2_reg"
    AuxLossWeight = "aux_loss_weight"  # paper's alpha; 0 disables
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.GruHidden, None)
        self.add_param(self.GruL2Reg, 0.00001)
        self.add_param(self.AuxLossWeight, 0.0)
        self.add_param(self.DeepHiddenUnits, (80, 40))
        self.add_param(self.DeepDropOut, (1.0, 1.0, 1.0))
        self.add_param(self.DeepActivation, "dice")
        self.add_param(self.DeepL2Reg, 0.00001)


class MaskNetHyperParams(BaseHyperParameters):
    """MaskNet config (arXiv:2102.07619; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    Variant = "variant"  # "parallel" | "serial"
    BlockDims = "block_dims"
    AggDim = "agg_dim"
    MaskL2Reg = "mask_l2_reg"
    DeepHiddenUnits = "deep_hidden_units"  # parallel-variant head MLP
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.Variant, "parallel")
        self.add_param(self.BlockDims, (32, 32))
        self.add_param(self.AggDim, 64)
        self.add_param(self.MaskL2Reg, 0.00001)
        self.add_param(self.DeepHiddenUnits, (32,))
        self.add_param(self.DeepDropOut, (1.0, 1.0))
        self.add_param(self.DeepActivation, "relu")
        self.add_param(self.DeepL2Reg, 0.00001)


class FinalMLPHyperParams(BaseHyperParameters):
    """FinalMLP config (arXiv:2304.00902; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    FS1Context = "fs1_context"  # feature names; () = context-free gate
    FS2Context = "fs2_context"
    FSGateHidden = "fs_gate_hidden"
    FSL2Reg = "fs_l2_reg"
    Mlp1HiddenUnits = "mlp1_hidden_units"
    Mlp1DropOut = "mlp1_dropout"
    Mlp2HiddenUnits = "mlp2_hidden_units"
    Mlp2DropOut = "mlp2_dropout"
    MlpActivation = "mlp_activation"
    MlpL2Reg = "mlp_l2_reg"
    NumHeads = "num_heads"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.FS1Context, ())
        self.add_param(self.FS2Context, ())
        self.add_param(self.FSGateHidden, 64)
        self.add_param(self.FSL2Reg, 0.0)
        self.add_param(self.Mlp1HiddenUnits, (64, 32))
        self.add_param(self.Mlp1DropOut, (1.0, 1.0))
        self.add_param(self.Mlp2HiddenUnits, (32, 32))
        self.add_param(self.Mlp2DropOut, (1.0, 1.0))
        self.add_param(self.MlpActivation, "relu")
        self.add_param(self.MlpL2Reg, 0.00001)
        self.add_param(self.NumHeads, 4)


class BSTHyperParams(BaseHyperParameters):
    """BST config (arXiv:1905.06874; beyond-reference model)."""

    EmbeddingSize = "embedding_size"
    EmbeddingL2Reg = "embedding_l2_reg"
    NumBlocks = "num_blocks"
    NumHeads = "num_heads"
    FFHidden = "ff_hidden"
    AttDropOut = "att_dropout"  # keep probability
    TransActivation = "trans_activation"
    TransL2Reg = "trans_l2_reg"
    DeepHiddenUnits = "deep_hidden_units"
    DeepDropOut = "deep_dropout"
    DeepActivation = "deep_activation"
    DeepL2Reg = "deep_l2_reg"

    def __init__(self):
        super().__init__()
        self.add_param(self.EmbeddingSize, 8)
        self.add_param(self.EmbeddingL2Reg, 0.00001)
        self.add_param(self.NumBlocks, 1)
        self.add_param(self.NumHeads, 2)
        self.add_param(self.FFHidden, 32)
        self.add_param(self.AttDropOut, 1.0)
        self.add_param(self.TransActivation, "leaky_relu")
        self.add_param(self.TransL2Reg, 0.0)
        self.add_param(self.DeepHiddenUnits, (32, 16))
        self.add_param(self.DeepDropOut, (1.0, 1.0, 1.0))
        self.add_param(self.DeepActivation, "leaky_relu")
        self.add_param(self.DeepL2Reg, 0.00001)
