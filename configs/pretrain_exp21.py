# Pre-training recipe: the reference's dws_mvlt_exp21
# (scripts_dws/configs/dws_mvlt_exp21.py) — pvlt_tiny @ 256, bs 150/device,
# 150 epochs, lr 2.5e-4 (x global_batch/512 scaling), wd 0.01,
# itm+mlm+t2i (weights 1/1/10), random_grid mask ratio 0.50 patch 16.
cfg = dict(
    model="pvlt_tiny",
    drop_path=0.1,
    clip_grad=None,
    output_dir="./runs/pretrain_exp21",
    data_set="FashionGen",
    input_size=256,
    loss_type={"itm": 1, "mlm": 1, "t2i": 1, "cls": 0},
    batch_size=150,
    epochs=150,
    lr=2.5e-4,
    weight_decay=0.01,
    mask_ratio=0.50,
    mask_strategy="random_grid",
    mask_patch_size=16,
    word_mask_rate=0.15,
)
