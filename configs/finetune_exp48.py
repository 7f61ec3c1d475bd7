# Fine-tuning recipe: the reference's dws_mvlt_ft_exp48
# (scripts_dws/configs/dws_mvlt_ft_exp48.py) — same model/input, 30 epochs,
# cls loss only (48-way super + 122-way sub recognition).
cfg = dict(
    model="pvlt_tiny",
    drop_path=0.1,
    clip_grad=None,
    output_dir="./runs/finetune_exp48",
    data_set="FashionGen",
    input_size=256,
    loss_type={"itm": 0, "mlm": 0, "t2i": 0, "cls": 1},
    batch_size=150,
    epochs=30,
    lr=2.5e-4,
    weight_decay=0.01,
    mask_ratio=0.50,
    mask_strategy="random_grid",
    mask_patch_size=16,
    word_mask_rate=0.15,
)
