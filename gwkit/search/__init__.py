"""gwkit.search — sliding-window continuous-search inference engine (Layer 5).

Replaces the reference's CPU-multiprocessing SegmentSlicer + DataLoader
pipeline (MLGWSC-1/inference.py:173-296,454-589) with a device-resident flow:
strain is transferred once per segment, whitened on device, windows are
gathered on device into MXU-sized batches, and the full front-end + encoder
+ head graph scores them inside one jit program. Triggers and clustering are
tiny host-side epilogues.
"""
