# Micro fine-tune config: cls-only objective on the same micro model as
# test_micro.py (the shape of scripts_dws/configs/dws_mvlt_ft_exp48.py).
cfg = dict(
    model="pvlt_tiny",
    output_dir="./runs/test_micro_ft",
    input_size=32,
    loss_type={"itm": 0, "mlm": 0, "t2i": 0, "cls": 1},
    batch_size=4,
    epochs=1,
    lr=1e-3,
    weight_decay=0.01,
    mask_ratio=0.50,
    mask_strategy="random_grid",
    mask_patch_size=16,
    word_mask_rate=0.15,
    model_overrides=dict(
        img_size=32, embed_dims=[8, 16, 32, 64], num_heads=[1, 2, 2, 4],
        mlp_ratios=[2, 2, 2, 2], token_hidden_size=32, num_text_tokens=16,
        vocab_size=30522, max_position_embeddings=64, itg_channel=8,
        compute_dtype="float32", use_pallas_attention=False,
    ),
)
