from simka_tpu.viz.visualize import (  # noqa: F401
    load_distance_matrix,
    plot_dendrogram,
    plot_heatmap,
    plot_pcoa,
    run_visualization,
)
