# Twins-PCPVT + semantic FPN (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="PCPVT", embed_dims=(16, 32, 64, 128),
                  num_heads=(1, 2, 4, 8), depths=(1, 1, 2, 1),
                  mlp_ratios=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1)),
    neck=dict(type="FPN", out_channels=32, num_levels=4, add_p6_pool=False),
    decode_head=dict(type="FPNHead", in_channels=(32, 32, 32, 32),
                     in_index=(0, 1, 2, 3), feature_strides=(4, 8, 16, 32),
                     channels=32, num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    test_cfg=dict(mode="whole"),
)
