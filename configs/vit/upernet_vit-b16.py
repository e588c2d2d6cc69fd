# UPerNet ViT-B/16 (reference configs/vit/upernet_vit-b16_mln_*.py)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="VisionTransformer", embed_dim=768, depth=12,
                  num_heads=12, patch_size=16, out_indices=(2, 5, 8, 11)),
    decode_head=dict(
        type="UPerHead", in_channels=(768, 768, 768, 768), channels=512,
        num_classes=150, dropout_ratio=0.1, align_corners=False),
    auxiliary_head=dict(
        type="FCNHead", in_channels=768, in_index=2, channels=256,
        num_convs=1, concat_input=False, num_classes=150,
        dropout_ratio=0.1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
