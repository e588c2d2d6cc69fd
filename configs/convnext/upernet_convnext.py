# UPerNet ConvNeXt (reference configs/convnext/upernet_convnext_*_ade20k.py;
# backbone from mmcls.ConvNeXt there, native flax ConvNeXt here).  Train
# with prediction.optimizers.make_layer_decay_optimizer(decay_type=
# 'stage_wise', decay_rate=0.9, num_layers=12) per the reference's
# LearningRateDecayOptimizerConstructor block.
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="ConvNeXt", arch="tiny", out_indices=(0, 1, 2, 3)),
    decode_head=dict(
        type="UPerHead", in_channels=(96, 192, 384, 768), channels=512,
        num_classes=150, dropout_ratio=0.1, align_corners=False),
    auxiliary_head=dict(
        type="FCNHead", in_channels=384, in_index=2, channels=256,
        num_convs=1, concat_input=False, num_classes=150,
        dropout_ratio=0.1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
