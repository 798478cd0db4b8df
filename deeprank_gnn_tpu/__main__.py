from deeprank_gnn_tpu.cli import main

main()
