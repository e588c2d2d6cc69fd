# FastFCN: JPU neck + PSPHead over ResNetV1c-50 (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="ResNetV1c", depth=50, base_channels=16,
                  stem_channels=16, num_stages=4, out_indices=(0, 1, 2, 3),
                  dilations=(1, 1, 1, 1), strides=(1, 2, 2, 2)),
    neck=dict(type="JPU", in_channels=(128, 256, 512), mid_channels=64,
              start_level=1, dilations=(1, 2, 4, 8)),
    decode_head=dict(type="PSPHead", in_channels=256, in_index=-1,
                     channels=64, pool_scales=(1, 2, 3, 6), num_classes=19,
                     dropout_ratio=0.1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
