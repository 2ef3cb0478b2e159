"""(stub — filled in during this round)"""
