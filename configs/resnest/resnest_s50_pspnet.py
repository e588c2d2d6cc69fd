# PSPNet over ResNeSt-50-d8 (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="ResNeSt", depth=50, base_channels=16,
                  stem_channels=16, radix=2, num_stages=4,
                  out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                  strides=(1, 2, 1, 1), contract_dilation=True),
    decode_head=dict(type="PSPHead", in_channels=512, in_index=3,
                     channels=64, pool_scales=(1, 2, 3, 6), num_classes=19,
                     dropout_ratio=0.1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
