# Micro config for CPU smoke tests and CI: tiny dims, synthetic data.
cfg = dict(
    model="pvlt_tiny",
    output_dir="./runs/test_micro",
    input_size=32,
    loss_type={"itm": 1, "mlm": 1, "t2i": 1, "cls": 0},
    batch_size=4,
    epochs=2,
    lr=1e-3,
    weight_decay=0.01,
    mask_ratio=0.50,
    mask_strategy="random_grid",
    mask_patch_size=16,
    word_mask_rate=0.15,
    # micro model dims (ModelConfig nested overrides)
    model_overrides=dict(
        img_size=32, embed_dims=[8, 16, 32, 64], num_heads=[1, 2, 2, 4],
        mlp_ratios=[2, 2, 2, 2], token_hidden_size=32, num_text_tokens=16,
        vocab_size=30522, max_position_embeddings=64, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False,
    ),
)
