"""Small model configs shared by the live oracle-parity tests, the golden
fixture generator (make_golden_parity.py), and the oracle-free frozen parity
tests (test_frozen_parity.py).

IMPORTANT: these shapes are baked into tests/golden/parity_small.npz — if you
change them, regenerate the fixtures (run make_golden_parity.py where the
reference oracle checkout is available).
"""

from pocket_tts_tpu.config import (
    Config, FlowConfig, FlowLMConfig, LookupTableConfig, MimiConfig,
    MimiTransformerConfig, QuantizerConfig, SEANetConfig, TransformerConfig,
)

SMALL_SEANET = SEANetConfig(
    dimension=32, channels=1, n_filters=8, n_residual_layers=1, ratios=(6, 5, 4),
    kernel_size=7, residual_kernel_size=3, last_kernel_size=3, dilation_base=2,
    pad_mode="constant", compress=2,
)

SMALL_MIMI = MimiConfig(
    sample_rate=24000, channels=1, frame_rate=12.5, seanet=SMALL_SEANET,
    transformer=MimiTransformerConfig(
        d_model=32, input_dimension=32, output_dimensions=(32,), num_heads=4,
        num_layers=2, layer_scale=0.01, context=250, dim_feedforward=64),
    quantizer=QuantizerConfig(dimension=8, output_dimension=32),
)

FLOW_CFG = Config(
    flow_lm=FlowLMConfig(
        flow=FlowConfig(dim=48, depth=2),
        transformer=TransformerConfig(d_model=64, num_heads=4, num_layers=2,
                                      hidden_scale=2, max_period=10000),
        lookup_table=LookupTableConfig(dim=64, n_bins=100),
    ),
    mimi=MimiConfig(quantizer=QuantizerConfig(dimension=16, output_dimension=32),
                    transformer=MimiTransformerConfig(d_model=32)),
)
