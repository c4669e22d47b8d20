"""(filled in later this round)"""
