"""gwkit.cli — argparse entry points mirroring the reference's scripts
(SURVEY.md §1 L7): train (signal_vs_noise), train_glitch, train_mlgwsc,
inference, evaluate, generate_data, calculate_efficiencies."""
