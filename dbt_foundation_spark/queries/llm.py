"""(populated in later commits)"""
