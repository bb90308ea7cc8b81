from wst_tpu.viz.visualize import (generate_test_patterns,
                                   visualize_advanced_stats, visualize_wst,
                                   create_comparison_dashboard,
                                   create_overall_comparison,
                                   compare_wst_coefficients, verify_output)

__all__ = ["generate_test_patterns", "visualize_advanced_stats",
           "visualize_wst", "create_comparison_dashboard",
           "create_overall_comparison", "compare_wst_coefficients",
           "verify_output"]
