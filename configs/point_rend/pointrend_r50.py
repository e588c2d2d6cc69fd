# PointRend over ResNetV1c-50 + FPN (zoo; cascade protocol)
model = dict(
    type="CascadeEncoderDecoder",
    num_stages=2,
    backbone=dict(type="ResNetV1c", depth=50, base_channels=16,
                  stem_channels=16, num_stages=4, out_indices=(0, 1, 2, 3),
                  dilations=(1, 1, 1, 1), strides=(1, 2, 2, 2)),
    neck=dict(type="FPN", out_channels=64, num_levels=4, add_p6_pool=False),
    decode_head=[
        dict(type="FPNHead", in_channels=(64, 64, 64, 64),
             in_index=(0, 1, 2, 3), feature_strides=(4, 8, 16, 32),
             channels=32, num_classes=19, dropout_ratio=-1,
             align_corners=False),
        dict(type="PointHead", in_channels=(64,), in_index=(0,), channels=64,
             num_fcs=3, coarse_pred_each_layer=True, num_classes=19,
             dropout_ratio=-1, align_corners=False),
    ],
    test_cfg=dict(mode="whole", subdivision_steps=2,
                  subdivision_num_points=256, scale_factor=2),
)
